"""DeepMind multi-object dataset readers, TF-free.

Feature specs match the vendored readers exactly
(third_party/multi_object_datasets/{multi_dsprites,objects_room,
clevr_with_masks,tetrominoes}.py): GZIP tfrecords, images uint8 [H,W,3],
masks in the canonical [entities, H, W] uint8 layout (trailing singleton
squeezed like the reference's decode_raw + squeeze).
"""

from typing import Dict, Iterator, Optional

import numpy as np

from genesis_tpu.data import tfrecord as tfr

# --- specs --------------------------------------------------------------

MULTI_DSPRITES_MAX_ENTITIES = {
    "binarized": 4, "colored_on_grayscale": 6, "colored_on_colored": 5}
OBJECTS_ROOM_MAX_ENTITIES = {
    "train": 7, "six_objects": 10, "empty_room": 4, "identical_color": 10}
CLEVR_MAX_ENTITIES = 11
TETROMINOES_MAX_ENTITIES = 4

F = tfr.FixedLenFeature


def multi_dsprites_spec(variant: str):
    m = MULTI_DSPRITES_MAX_ENTITIES[variant]
    c = 1 if variant == "binarized" else 3
    return {
        "image": F([64, 64, c], "string"),
        # stored as [H, W, entities, 1]; transposed to [entities, H, W]
        "mask": F([64, 64, m, 1], "string"),
        "x": F([m], "float32"),
        "y": F([m], "float32"),
        "shape": F([m], "float32"),
        "color": F([m, c], "float32"),
        "visibility": F([m], "float32"),
        "orientation": F([m], "float32"),
        "scale": F([m], "float32"),
    }, ("image", "mask"), True  # needs mask transpose


def objects_room_spec(variant: str):
    m = OBJECTS_ROOM_MAX_ENTITIES[variant]
    return {
        "image": F([64, 64, 3], "string"),
        "mask": F([m, 64, 64, 1], "string"),
    }, ("image", "mask"), False


def clevr_spec():
    m = CLEVR_MAX_ENTITIES
    return {
        "image": F([240, 320, 3], "string"),
        "mask": F([m, 240, 320, 1], "string"),
        "x": F([m], "float32"),
        "y": F([m], "float32"),
        "z": F([m], "float32"),
        "pixel_coords": F([m, 3], "float32"),
        "rotation": F([m], "float32"),
        "visibility": F([m], "float32"),
        # byte features without fixed numeric shape are kept raw
    }, ("image", "mask"), False


def tetrominoes_spec():
    m = TETROMINOES_MAX_ENTITIES
    return {
        "image": F([35, 35, 3], "string"),
        "mask": F([m, 35, 35, 1], "string"),
        "x": F([m], "float32"),
        "y": F([m], "float32"),
        "shape": F([m], "float32"),
        "color": F([m, 3], "float32"),
        "visibility": F([m], "float32"),
    }, ("image", "mask"), False


def _get_spec(name: str, variant: Optional[str]):
    if name == "multi_dsprites":
        return multi_dsprites_spec(variant or "colored_on_colored")
    if name == "objects_room":
        return objects_room_spec(variant or "train")
    if name == "clevr":
        return clevr_spec()
    if name == "tetrominoes":
        return tetrominoes_spec()
    raise NotImplementedError(f"{name} not a valid dataset.")


def _reshape_byte_feature(arr: np.ndarray, feat) -> np.ndarray:
    shape = feat.shape
    if shape and shape[-1] == 1:  # decode_raw + squeeze(-1)
        shape = shape[:-1]
    return arr.reshape(shape)


def make_decoder(name: str, variant: Optional[str] = None,
                 fields: Optional[tuple] = None):
    """Build a pure record-bytes -> example-dict decoder.

    Splitting decode from the (inherently sequential, GZIP) record stream
    lets data loaders parallelise the CPU-bound proto/byte extraction
    across worker threads while one reader drains the stream.
    """
    spec, byte_feats, transpose = _get_spec(name, variant)

    # Exact byte sizes from the fixed feature specs: one native scan
    # per field instead of a size query + copy pair.
    nbytes = {k: int(np.prod(f.shape)) for k, f in spec.items()
              if f.dtype == "string" and k in byte_feats}

    def decode(record: bytes) -> Dict[str, np.ndarray]:
        example: Dict[str, np.ndarray] = {}
        if fields is not None:
            for key in fields:
                feat = spec[key]
                if feat.dtype == "string" and key in byte_feats:
                    arr = tfr.extract_bytes(record, key,
                                            size_hint=nbytes[key])
                    example[key] = _reshape_byte_feature(arr, feat)
                elif feat.dtype == "float32":
                    example[key] = tfr.extract_floats(
                        record, key).reshape(feat.shape)
                else:
                    raise ValueError(f"Unsupported fast field {key}")
        else:
            parsed = tfr.parse_example(record)
            example = tfr.apply_spec(
                {k: parsed[k] for k in spec if k in parsed},
                {k: v for k, v in spec.items() if k in parsed},
                byte_features=byte_feats)
        if transpose and "mask" in example:
            # multi_dsprites stores masks [H, W, E]; canonical is [E,H,W]
            example["mask"] = np.transpose(example["mask"], (2, 0, 1))
        return example

    return decode


def dataset(tfrecords_path: str, name: str,
            variant: Optional[str] = None,
            skip: int = 0,
            fields: Optional[tuple] = None
            ) -> Iterator[Dict[str, np.ndarray]]:
    """Stream decoded examples {image: [H,W,3] u8, mask: [E,H,W] u8, ...}.

    `skip` fast-skips records without proto parsing (the take/skip
    train/val/test split). `fields` restricts decoding to the named
    features — with the native parser this extracts just those fields
    from the wire bytes (the hot path decodes only image+mask).
    """
    decode = make_decoder(name, variant, fields)
    for record in tfr.iter_records(tfrecords_path, compression="auto",
                                   skip=skip):
        yield decode(record)
