"""DPT depth head vs the REAL Depth-Anything architecture (HF transformers).

The reference loads its `--use_dpt_head` weights from an external DA-V2
checkpoint (dreamvla_model.py:516-537) that can't be downloaded here; the
installed `transformers` ships the same neck+fusion+head architecture
(DepthAnythingForDepthEstimation, a validated port). This test randomly
initialises a tiny HF model, remaps its neck/head weights into the original
DA-V2 `depth_head.*` layout `import_dpt_head` consumes, and requires our
DPTHead to reproduce the HF forward bit-closely — covering the reassemble
convs, RefineNet fusion order, and the align_corners=True bilinear resizes
(a real divergence this oracle caught: jax.image.resize uses half-pixel
sampling).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from dreamvla_tpu.models.dpt_head import DPTHead, import_dpt_head

B, PH, PW = 2, 4, 4
C_IN = 32
NECK = (8, 12, 16, 24)
FUSION = 16


def _hf_to_da2(hf):
    sd = hf.state_dict()
    out = {}

    def conv(src, dst):
        out[f"{dst}.weight"] = sd[f"{src}.weight"]
        if f"{src}.bias" in sd:
            out[f"{dst}.bias"] = sd[f"{src}.bias"]

    for i in range(4):
        conv(f"neck.reassemble_stage.layers.{i}.projection",
             f"depth_head.projects.{i}")
        if i != 2:  # stage 2 resize is identity
            conv(f"neck.reassemble_stage.layers.{i}.resize",
                 f"depth_head.resize_layers.{i}")
        out[f"depth_head.scratch.layer{i+1}_rn.weight"] = sd[
            f"neck.convs.{i}.weight"]
    # HF fusion layers[0..3] process deepest-first = refinenet4..1
    for j, r in enumerate((4, 3, 2, 1)):
        hp = f"neck.fusion_stage.layers.{j}"
        dp = f"depth_head.scratch.refinenet{r}"
        conv(f"{hp}.projection", f"{dp}.out_conv")
        for unit, hunit in (("resConfUnit1", "residual_layer1"),
                            ("resConfUnit2", "residual_layer2")):
            conv(f"{hp}.{hunit}.convolution1", f"{dp}.{unit}.conv1")
            conv(f"{hp}.{hunit}.convolution2", f"{dp}.{unit}.conv2")
    conv("head.conv1", "depth_head.scratch.output_conv1")
    conv("head.conv2", "depth_head.scratch.output_conv2.0")
    conv("head.conv3", "depth_head.scratch.output_conv2.2")
    return {k: v.numpy() for k, v in out.items()}


def test_dpt_head_matches_hf_depth_anything():
    from transformers import (DepthAnythingConfig,
                              DepthAnythingForDepthEstimation, Dinov2Config)

    torch.manual_seed(0)
    cfg = DepthAnythingConfig(
        backbone_config=Dinov2Config(hidden_size=C_IN, num_hidden_layers=1,
                                     num_attention_heads=2, patch_size=14),
        reassemble_hidden_size=C_IN, neck_hidden_sizes=list(NECK),
        fusion_hidden_size=FUSION, head_hidden_size=32, patch_size=14,
        depth_estimation_type="metric", max_depth=1.0)
    hf = DepthAnythingForDepthEstimation(cfg).eval()

    rng = np.random.default_rng(0)
    # four DIFFERENT stage token sets (the reference feeds one block four
    # times; different ones exercise every stage path independently)
    tokens = [rng.normal(size=(B, PH * PW, C_IN)).astype(np.float32) * 0.5
              for _ in range(4)]
    with torch.no_grad():
        # HF neck strips a cls token from each hidden state
        hs = [torch.cat([torch.zeros(B, 1, C_IN),
                         torch.from_numpy(t)], dim=1) for t in tokens]
        fused = hf.neck(hs, PH, PW)
        want = hf.head(fused, PH, PW).numpy()  # (B, 14*PH, 14*PW)

    head = DPTHead(in_channels=C_IN, features=FUSION, out_channels=NECK,
                   metric=True)
    params, missing, unexpected = import_dpt_head(_hf_to_da2(hf))
    assert not missing and not unexpected, (missing, unexpected)
    with jax.default_matmul_precision("highest"):
        got = head.apply({"params": params},
                         [jnp.asarray(t) for t in tokens], PH, PW)
    np.testing.assert_allclose(np.asarray(got)[:, 0], want,
                               atol=5e-5, rtol=0)