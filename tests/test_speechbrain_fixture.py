"""Pin the speechbrain-ConformerEncoder checkpoint mapping (VERDICT item 4).

tests/fixtures_speechbrain.py re-implements speechbrain's ConformerEncoder in
torch with the real submodule names, so `state_dict()` produces the actual
key inventory a released reference checkpoint would contain for the
separation net's intra blocks.  These tests assert:

1. convert_state_dict maps EVERY key (zero unmatched) onto our
   ConformerLayer param tree;
2. the converted flax layer reproduces the torch encoder's forward output
   (rel-pos attention, conv module, half-step FFNs, both final norms).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from acousticswarms_speech_tpu.models.conformer import (  # noqa: E402
    ConformerLayer,
)
from acousticswarms_speech_tpu.models.convert import (  # noqa: E402
    convert_state_dict,
)

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixtures_speechbrain import ConformerEncoder, RelPosEncXL  # noqa: E402

C, F, H, K = 8, 16, 2, 5
PREFIX = "bottleneck.module_list.0.intra."


@pytest.fixture(scope="module")
def torch_encoder():
    torch.manual_seed(0)
    enc = ConformerEncoder(num_layers=1, d_model=C, d_ffn=F, nhead=H,
                           kernel_size=K).double().eval()
    # non-trivial norm affines so a mapping error cannot hide
    with torch.no_grad():
        for p in enc.parameters():
            if p.ndim == 1:
                p.add_(torch.rand_like(p) * 0.3)
    return enc


def _prefixed_state_dict(enc):
    return {PREFIX + k: v.detach().numpy() for k, v in
            enc.state_dict().items()}


def test_zero_unmatched_keys(torch_encoder):
    sd = _prefixed_state_dict(torch_encoder)
    converted, unmatched = convert_state_dict(sd, "SpeakerSeparation")
    assert unmatched == [], f"unmatched speechbrain keys: {unmatched}"
    sub = converted["params"]["bottleneck_0_intra"]
    # every torch tensor landed somewhere in the subtree
    n_leaves = len(jax.tree_util.tree_leaves(sub))
    assert n_leaves == len(sd)
    # spot-check shapes of the layout-sensitive entries
    assert sub["mhsa"]["in_proj_weight"].shape == (3 * C, C)
    assert sub["mhsa"]["pos_bias_u"].shape == (H, C // H)
    assert sub["conv"]["pointwise1"]["weight"].shape == (2 * C, C, 1)
    assert sub["conv"]["depthwise"]["weight"].shape == (C, 1, K)
    assert sub["conv"]["pointwise2"]["weight"].shape == (C, C, 1)
    assert sub["norm_enc"]["weight"].shape == (C,)


def test_forward_equivalence(torch_encoder):
    sd = _prefixed_state_dict(torch_encoder)
    converted, _ = convert_state_dict(sd, "SpeakerSeparation")
    sub = jax.tree_util.tree_map(jnp.asarray,
                                 converted["params"]["bottleneck_0_intra"])
    sub["mhsa"]["in_proj_bias"] = jnp.zeros(3 * C)  # speechbrain has none

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 12, C))

    xt = torch.from_numpy(x).double()
    with torch.no_grad():
        pe = RelPosEncXL(C)(xt)
        y_torch = torch_encoder(xt, pe).numpy()

    layer = ConformerLayer(d_model=C, d_ffn=F, num_heads=H, kernel_size=K)
    y_flax = np.asarray(layer.apply({"params": sub},
                                    jnp.asarray(x, dtype=jnp.float32)))
    np.testing.assert_allclose(y_flax, y_torch, rtol=2e-4, atol=2e-5)
