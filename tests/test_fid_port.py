"""FID Inception weight-port parity.

Proves scripts/port_fid_weights.py maps the torch FID checkpoint layout
(third_party/pytorch_fid/inception.py:16+) correctly onto the flax
InceptionV3FID tree: random weights are loaded into BOTH graphs and the
pool3 features must agree. This makes `make_extractor("inception")`
trustworthy the moment the real .pth lands (no egress here).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch = pytest.importorskip("torch")

from scripts.port_fid_weights import (  # noqa: E402
    build_torch_fid_inception, flax_template, port_state_dict,
    verify_parity)


@pytest.fixture(scope="module")
def random_sd():
    """Random state dict in the exact real-checkpoint layout, plus the
    fc/AuxLogits keys the porter must skip."""
    torch.manual_seed(0)
    oracle = build_torch_fid_inception()
    sd = oracle.state_dict()
    gen = torch.Generator().manual_seed(1)
    for key, t in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        if key.endswith("running_var"):
            t.copy_(0.5 + torch.rand(t.shape, generator=gen))
        else:
            t.copy_(torch.randn(t.shape, generator=gen) * 0.1)
    sd["fc.weight"] = torch.randn(1008, 2048, generator=gen)
    sd["fc.bias"] = torch.randn(1008, generator=gen)
    sd["AuxLogits.conv0.conv.weight"] = torch.randn(
        128, 768, 1, 1, generator=gen)
    return sd


def test_port_tree_complete(random_sd):
    variables = port_state_dict(random_sd, flax_template())
    # 2048-d trunk: last BasicConv2d of Mixed_7c branch_pool exists
    assert variables["params"]["Mixed_7c"]["branch_pool"]["conv"][
        "kernel"].shape == (1, 1, 2048, 192)
    assert variables["batch_stats"]["Conv2d_1a_3x3"]["bn"][
        "mean"].shape == (32,)


def test_port_rejects_unknown_key(random_sd):
    sd = dict(random_sd)
    sd["Mixed_5b.branch1x1.conv.bias"] = torch.zeros(64)
    with pytest.raises(ValueError, match="unexpected checkpoint key"):
        port_state_dict(sd)


def test_pool3_parity_299(random_sd):
    """Same weights, both graphs, native 299x299 input: features match."""
    variables = port_state_dict(random_sd, flax_template())
    err = verify_parity(random_sd, variables, batch=1, size=299,
                        atol=1e-4)
    assert err <= 1e-4


def test_pool3_parity_resized_64(random_sd):
    """64px input exercises the bilinear-resize protocol on both sides
    (torch align_corners=False == jax.image.resize half-pixel centers)."""
    variables = port_state_dict(random_sd, flax_template())
    err = verify_parity(random_sd, variables, batch=1, size=64, atol=1e-3)
    assert err <= 1e-3


def test_cli_drop_procedure_end_to_end(random_sd, tmp_path, monkeypatch,
                                       capsys):
    """The README runbook's one-command drop: save a synthetic .pth in
    the real checkpoint layout, run the port CLI with --verify, and
    assert the msgpack lands where make_extractor() probes and the
    extractor switches from 'random' to 'inception'."""
    import scripts.port_fid_weights as pfw

    pth = tmp_path / "pt_inception-synthetic.pth"
    torch.save(random_sd, str(pth))
    out = tmp_path / "fid_inception_params.msgpack"
    monkeypatch.setattr(
        sys, "argv",
        ["port_fid_weights.py", "--torch_ckpt", str(pth),
         "--out", str(out), "--verify"])
    pfw.main()
    assert out.exists() and out.stat().st_size > 10 ** 6
    assert "parity verified" in capsys.readouterr().out

    # The FID extractor now activates from the env var.
    monkeypatch.setenv("GENESIS_TPU_FID_WEIGHTS", str(out))
    from genesis_tpu.eval import fid as F
    extractor = F.make_extractor("auto")
    assert extractor.name == "inception"
