"""Frechet Inception Distance.

TPU-native pipeline replacing the reference's vendored pytorch_fid
(third_party/pytorch_fid/fid_score.py:71-252 + scripts/compute_fid.py):
features are computed directly from device tensors — no 20k-PNG round
trip through the filesystem — then (mu, Sigma) and the Frechet distance
with scipy sqrtm stabilisation (fid_score.py:139-194).

Extractors:
  * 'inception' — the faithful FID-InceptionV3 port (eval/inception.py);
    used automatically when ported weights are present. Comparable to
    published FID numbers.
  * 'random' — deterministic random-init conv features (fixed seed).
    Always available offline; self-consistent for tracking progress, NOT
    comparable to published FID values.
"""

import math
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from genesis_tpu.core.experiment import fprint
from genesis_tpu.eval import inception as inception_lib


# ---------------------------------------------------------------------------
# Feature extractors
# ---------------------------------------------------------------------------

class InceptionExtractor:
    name = "inception"
    feat_dim = 2048

    def __init__(self, weights: Optional[str] = None, variables=None):
        self.model = inception_lib.InceptionV3FID()
        if variables is not None:
            # Pre-ported variables (tests inject random-weight ports here
            # for pipeline parity against the reference implementation).
            self.variables = variables
        else:
            path = weights or inception_lib.weights_path()
            template = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
            if path is not None:
                self.variables = inception_lib.load_params(path, template)
            else:
                raise FileNotFoundError(
                    "No FID Inception weights found (set "
                    f"${inception_lib.WEIGHTS_ENV})")
        self._fn = jax.jit(lambda v, x: self.model.apply(v, x))

    def __call__(self, images) -> jnp.ndarray:
        return self._fn(self.variables, images)


class RandomConvExtractor:
    """Deterministic random strided-conv features, 2048-d. A fixed-seed
    random projection is a valid (if weaker) feature map for Frechet
    distances; it keeps the full FID pipeline exercisable offline."""
    name = "random"
    feat_dim = 2048

    def __init__(self, seed: int = 0):
        from flax import linen as nn

        class _Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                if x.shape[1] != 64 or x.shape[2] != 64:
                    x = jax.image.resize(
                        x, (x.shape[0], 64, 64, x.shape[-1]), "bilinear")
                x = 2.0 * x - 1.0
                for feats in (64, 128, 256, 512):
                    x = nn.Conv(feats, (3, 3), strides=(2, 2),
                                padding="SAME", use_bias=False)(x)
                    x = nn.gelu(x)
                x = jnp.concatenate(
                    [jnp.mean(x, axis=(1, 2)), jnp.max(x, axis=(1, 2)),
                     jnp.std(x, axis=(1, 2)),
                     jnp.mean(jnp.abs(x), axis=(1, 2))], axis=-1)
                return x

        self.model = _Net()
        self.variables = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
        self._fn = jax.jit(lambda v, x: self.model.apply(v, x))

    def __call__(self, images) -> jnp.ndarray:
        return self._fn(self.variables, images)


def make_extractor(kind: str = "auto"):
    if kind in ("auto", "inception"):
        try:
            return InceptionExtractor()
        except FileNotFoundError:
            if kind == "inception":
                raise
            fprint("FID: no Inception weights available — falling back to "
                   "the deterministic random-feature extractor (values are "
                   "self-consistent, not comparable to published FID).")
    return RandomConvExtractor()


# ---------------------------------------------------------------------------
# Statistics + Frechet distance
# ---------------------------------------------------------------------------

def compute_statistics(batches: Iterable[np.ndarray], extractor,
                       max_images: Optional[int] = None,
                       log_every: int = 2000
                       ) -> Tuple[np.ndarray, np.ndarray]:
    feats = []
    count = 0
    logged = 0
    for batch in batches:
        if max_images is not None and count >= max_images:
            break
        f = np.asarray(extractor(jnp.asarray(batch)))
        if max_images is not None and count + len(f) > max_images:
            f = f[:max_images - count]
        feats.append(f)
        count += len(f)
        # Heartbeat: the end-of-training FID stage can run quietly for
        # many minutes (10k sampled images over a device tunnel);
        # watchdog-style supervisors treat a silent log as a hang.
        if log_every and count - logged >= log_every:
            fprint(f"FID: {count}/{max_images or '?'} images featurised")
            logged = count
    if not feats:
        raise ValueError(
            "FID feature stream produced no batches — check that the "
            "data split has at least `batch_size` images (a loader with "
            "batch_size larger than the split yields nothing).")
    allf = np.concatenate(feats, axis=0).astype(np.float64)
    return allf.mean(axis=0), np.cov(allf, rowvar=False)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)), with the eps jitter
    retry and imaginary-part check of pytorch_fid fid_score.py:139-194."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    # disp=False like the reference: scipy otherwise *prints* a
    # "Matrix is singular" diagnostic for near-singular products even
    # when the result is usable (fid_score.py:176).
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        fprint(f"fid calculation produces singular product; "
               f"adding {eps} to diagonal of cov estimates")
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = linalg.sqrtm(
            (sigma1 + offset).dot(sigma2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


# ---------------------------------------------------------------------------
# Model-level driver (reference scripts/compute_fid.py:101-137)
# ---------------------------------------------------------------------------

def fid_from_model(model, state, test_loader, batch_size: int = 10,
                   num_images: int = 10000, feat_dim: int = 2048,
                   img_dir: Optional[str] = None,
                   extractor_kind: str = "auto",
                   seed: int = 0) -> float:
    """FID between test-set images and model samples.

    Follows the reference protocol (num_images test vs num_images
    sampled, pool3 stats) but streams tensors straight into the feature
    net. If `img_dir` is set, PNG dumps are also written for parity
    with the reference's on-disk pipeline.
    """
    extractor = make_extractor(extractor_kind)
    if feat_dim != extractor.feat_dim:
        fprint(f"WARNING: feat_dim={feat_dim} requested but only the "
               f"{extractor.feat_dim}-d pool3 feature space is "
               "implemented; using that.")
    fprint(f"FID: extractor={extractor.name}, images={num_images}")

    dump_state = {"test": 0, "gen": 0}

    def dump(images, sub):
        if img_dir is None:
            return
        import os
        from PIL import Image
        d = os.path.join(img_dir,
                         "test_images" if sub == "test"
                         else "generated_images")
        os.makedirs(d, exist_ok=True)
        for img in images:
            if dump_state[sub] >= num_images:
                return
            Image.fromarray(np.uint8(255 * np.clip(img, 0, 1))).save(
                os.path.join(d, str(dump_state[sub]).zfill(6) + ".png"))
            dump_state[sub] += 1

    def test_batches():
        from genesis_tpu.data.loader import prepare_input
        for batch in test_loader:
            arr = np.asarray(prepare_input(batch["input"]))
            dump(arr, "test")
            yield arr

    mu_real, sig_real = compute_statistics(
        test_batches(), extractor, max_images=num_images)

    variables = {"params": state.params}
    if jax.tree_util.tree_leaves(state.batch_stats):
        variables["batch_stats"] = state.batch_stats

    sample = jax.jit(
        lambda v, key: model.apply(v, batch_size, rngs={"sample": key},
                                   method=model.sample)[0],
        static_argnames=())

    def gen_batches():
        key = jax.random.PRNGKey(seed + 99)
        for _ in range(math.ceil(num_images / batch_size)):
            key, sub = jax.random.split(key)
            arr = np.asarray(sample(variables, sub))
            dump(arr, "gen")
            yield arr

    mu_gen, sig_gen = compute_statistics(
        gen_batches(), extractor, max_images=num_images)

    fid = frechet_distance(mu_real, sig_real, mu_gen, sig_gen)
    fprint(f"FID: {fid}", True)
    return fid
