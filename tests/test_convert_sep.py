"""Separation-net converter roundtrip with reference/speechbrain key names."""
import numpy as np
import jax
import jax.numpy as jnp

from acousticswarms_speech_tpu.models import SepNet
from acousticswarms_speech_tpu.models.convert import convert_state_dict

CFG = dict(n_mics=4, max_speakers=2, kernel_size=5, stride_list=(2, 2),
           channels=4, growth=2, encoder_channels=8, encoder_kernel_size=33,
           encoder_stride=16, residual_layers=1, residual_dilation_factor=2,
           num_head=2, ffw_dim=8, bottleneck_layers=1, bottleneck_ksize=7)


def _to_torch_names(tree):
    sd = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
            return
        p = path
        name = None
        simple = {"preproc", "reference_bypass", "mask_encoder",
                  "output_decoder"}
        if p[0] in simple:
            name = f"{p[0]}.{p[-1]}"
        elif p[0].startswith("encoder_") or p[0].startswith("decoder_"):
            kind, i = p[0].split("_")
            if p[1] == "res":
                j = p[2].split("_")[1]
                name = f"{kind}.module_list.{i}.res.seq.{j}.{p[3]}.{p[4]}"
            elif p[1] == "upsample_conv":
                name = f"{kind}.module_list.{i}.upsample.conv.{p[2]}"
            else:
                name = f"{kind}.module_list.{i}.{p[1]}.{p[2]}"
        elif "_inter" in p[0]:
            l = p[0].split("_")[1]
            rest = ".".join(p[1:])
            name = f"bottleneck.module_list.{l}.inter.layers.0.{rest}"
        elif "_intra" in p[0]:
            l = p[0].split("_")[1]
            prefix = f"bottleneck.module_list.{l}.intra.layers.0."
            # our path -> speechbrain key (inverse of _CONFORMER_TABLE;
            # the forward direction is pinned against an actual torch
            # state_dict in test_speechbrain_fixture.py)
            mapping = {
                ("norm_ffn1",): "ffn_module1.0.{leaf}",
                ("ffn1", "linear1"): "ffn_module1.1.ffn.0.{leaf}",
                ("ffn1", "linear2"): "ffn_module1.1.ffn.3.{leaf}",
                ("norm_ffn2",): "ffn_module2.0.{leaf}",
                ("ffn2", "linear1"): "ffn_module2.1.ffn.0.{leaf}",
                ("ffn2", "linear2"): "ffn_module2.1.ffn.3.{leaf}",
                ("norm_mhsa",): "norm1.norm.{leaf}",
                ("mhsa", "out_proj"): "mha_layer.out_proj.{leaf}",
                ("norm_conv",): "convolution_module.layer_norm.{leaf}",
                ("conv", "pointwise1"): "convolution_module.bottleneck.0.{leaf}",
                ("conv", "depthwise"): "convolution_module.conv.{leaf}",
                ("conv", "norm"): "convolution_module.after_conv.0.{leaf}",
                ("conv", "pointwise2"): "convolution_module.after_conv.2.{leaf}",
                ("norm_final",): "norm2.norm.{leaf}",
            }
            leafless = {
                ("mhsa", "in_proj_weight"): "mha_layer.in_proj_weight",
                ("mhsa", "linear_pos_weight"): "mha_layer.linear_pos.weight",
                ("mhsa", "pos_bias_u"): "mha_layer.pos_bias_u",
                ("mhsa", "pos_bias_v"): "mha_layer.pos_bias_v",
            }
            key = tuple(p[1:-1])
            full = tuple(p[1:])
            if full == ("mhsa", "in_proj_bias"):
                # speechbrain's RelPosMHAXL has no qkv bias; our (zero) bias
                # simply has no checkpoint counterpart
                return
            if full in leafless:
                name = prefix + leafless[full]
            elif key in mapping:
                name = prefix + mapping[key].format(leaf=p[-1])
            elif key == ("norm_enc",):
                # encoder-level final norm lives outside layers.0
                name = f"bottleneck.module_list.{l}.intra.norm.norm.{p[-1]}"
        assert name is not None, p
        val = np.asarray(node)
        if name.endswith("after_conv.2.weight"):
            val = val[:, :, 0]  # our 1x1 conv <-> speechbrain's nn.Linear
        sd[name] = val

    walk(tree["params"], [])
    return sd


def test_convert_sep_roundtrip():
    model = SepNet(**CFG)
    x = jnp.zeros((1, 2 * 4, 128))
    n = jnp.asarray([2])
    ref_params = model.init(jax.random.PRNGKey(0), x, n)

    sd = _to_torch_names(ref_params)
    converted, unmatched = convert_state_dict(sd, "SpeakerSeparation")
    assert unmatched == [], unmatched

    # merge fills the one param with no torch counterpart (zero qkv bias)
    from acousticswarms_speech_tpu.training.experiment import _merge_params

    merged = _merge_params(ref_params, converted)

    rng = np.random.default_rng(0)
    xin = jnp.asarray(rng.normal(size=(1, 8, 128)).astype(np.float32))
    y_ref = model.apply(ref_params, xin, n)
    y_conv = model.apply(merged, xin, n)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_conv))
