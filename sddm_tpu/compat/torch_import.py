"""Import reference PyTorch checkpoints into sddm_tpu Flax params.

Maps the reference ``UNetModified2`` state_dict (model/UNetModified2.py) onto
this framework's Flax parameter tree, converting layouts:
  - Conv2d  [O, I, kh, kw] -> flax kernel [kh, kw, I, O]
  - Linear  [O, I]         -> Dense kernel [I, O]
  - GroupNorm weight/bias  -> scale/bias

Weights live inside an ``SDDM`` checkpoint under the
``noise_estimate_model.`` prefix (the reference saves the composite's
state_dict, base/base_trainer.py:109-116).

This is both a migration path for users with reference checkpoints and the
strongest form of parity verification: with imported weights, both
implementations produce matching outputs (see
tests/test_torch_import.py).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _conv(w, b):
    return {
        "kernel": jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0))),
        "bias": jnp.asarray(np.asarray(b)),
    }


def _dense(w, b):
    return {
        "kernel": jnp.asarray(np.transpose(np.asarray(w), (1, 0))),
        "bias": jnp.asarray(np.asarray(b)),
    }


def _norm(w, b):
    return {"scale": jnp.asarray(np.asarray(w)),
            "bias": jnp.asarray(np.asarray(b))}


def _strip_prefix(state: Mapping[str, "np.ndarray"], prefix: str):
    # np.array (copy) rather than np.asarray: jnp.asarray on the CPU backend
    # zero-copies aligned numpy views, and torch tensors expose such views —
    # without the copy the imported params would ALIAS live torch parameter
    # memory and mutate under a later torch optimizer.step().
    out = {}
    for k, v in state.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = np.array(v)
    return out if out else dict((k, np.array(v)) for k, v in state.items())


def _convert_resnet_block(sd: Mapping, prefix: str, has_res_conv: bool) -> Dict:
    out = {
        "Block_0": {
            "GroupNorm_0": _norm(
                sd[f"{prefix}.block1.block.0.weight"],
                sd[f"{prefix}.block1.block.0.bias"],
            ),
            "Conv_0": _conv(
                sd[f"{prefix}.block1.block.3.weight"]
                if f"{prefix}.block1.block.3.weight" in sd
                else sd[f"{prefix}.block1.block.2.weight"],
                sd[f"{prefix}.block1.block.3.bias"]
                if f"{prefix}.block1.block.3.bias" in sd
                else sd[f"{prefix}.block1.block.2.bias"],
            ),
        },
        "FeatureWiseAffine_0": {
            "Dense_0": _dense(
                sd[f"{prefix}.noise_func.noise_func.0.weight"],
                sd[f"{prefix}.noise_func.noise_func.0.bias"],
            )
        },
        "Block_1": {
            "GroupNorm_0": _norm(
                sd[f"{prefix}.block2.block.0.weight"],
                sd[f"{prefix}.block2.block.0.bias"],
            ),
            "Conv_0": _conv(
                sd[f"{prefix}.block2.block.3.weight"]
                if f"{prefix}.block2.block.3.weight" in sd
                else sd[f"{prefix}.block2.block.2.weight"],
                sd[f"{prefix}.block2.block.3.bias"]
                if f"{prefix}.block2.block.3.bias" in sd
                else sd[f"{prefix}.block2.block.2.bias"],
            ),
        },
    }
    if has_res_conv:
        out["Conv_0"] = _conv(
            sd[f"{prefix}.res_conv.weight"], sd[f"{prefix}.res_conv.bias"]
        )
    return out


def _convert_attn(sd: Mapping, prefix: str) -> Dict:
    """Reference SelfAttention (model/UNetModified.py:140-169): GroupNorm,
    bias-free 1x1 qkv conv, 1x1 out conv."""
    return {
        "GroupNorm_0": _norm(
            sd[f"{prefix}.norm.weight"], sd[f"{prefix}.norm.bias"]
        ),
        "Conv_0": {
            "kernel": jnp.asarray(
                np.transpose(np.asarray(sd[f"{prefix}.qkv.weight"]),
                             (2, 3, 1, 0))
            )
        },
        "Conv_1": _conv(
            sd[f"{prefix}.out.weight"], sd[f"{prefix}.out.bias"]
        ),
    }


def _convert_rbwa(sd: Mapping, prefix: str, has_res_conv: bool,
                  with_attn: bool) -> Dict:
    out = {
        "ResnetBlock_0": _convert_resnet_block(
            sd, f"{prefix}.res_block", has_res_conv
        )
    }
    if with_attn:
        out["SelfAttention2D_0"] = _convert_attn(sd, f"{prefix}.attn")
    return out


def import_unet_modified_state(
    state_dict: Mapping[str, "np.ndarray"],
    channel_mults=(1, 2, 4, 8, 8),
    attn_layer=(4,),
    res_blocks: int = 3,
    inner_channel: int = 32,
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference UNetModified state_dict (model/UNetModified.py:
    186-323, the SR3-style attention UNet) to flax params for
    :class:`sddm_tpu.models.UNetModified`."""
    sd = _strip_prefix(state_dict, prefix)

    params: Dict = {
        # noise MLP: Sequential(PE, Linear, Swish, Linear) — NO final Swish
        # (UNetModified.py:205-211)
        "Dense_0": _dense(
            sd["noise_level_mlp.1.weight"], sd["noise_level_mlp.1.bias"]
        ),
        "Dense_1": _dense(
            sd["noise_level_mlp.3.weight"], sd["noise_level_mlp.3.bias"]
        ),
        "Conv_0": _conv(sd["downs.0.weight"], sd["downs.0.bias"]),
    }

    k = ds = us = 0
    torch_idx = 1
    n_in = inner_channel
    num_mults = len(channel_mults)
    for ind, mult in enumerate(channel_mults):
        use_attn = ind in attn_layer
        n_out = inner_channel * mult
        for _ in range(res_blocks):
            params[f"ResnetBlocWithAttn_{k}"] = _convert_rbwa(
                sd, f"downs.{torch_idx}", n_in != n_out, use_attn
            )
            n_in = n_out
            k += 1
            torch_idx += 1
        if ind != num_mults - 1:  # no downsample after the last level
            params[f"Downsample_{ds}"] = {
                "Conv_0": _conv(
                    sd[f"downs.{torch_idx}.conv.weight"],
                    sd[f"downs.{torch_idx}.conv.bias"],
                )
            }
            ds += 1
            torch_idx += 1

    # mid: attn block then plain block (UNetModified.py:255-260)
    params[f"ResnetBlocWithAttn_{k}"] = _convert_rbwa(sd, "mid.0", False, True)
    k += 1
    params[f"ResnetBlocWithAttn_{k}"] = _convert_rbwa(sd, "mid.1", False, False)
    k += 1

    # decoder: res_blocks+1 skip-concat blocks per level, upsample between
    # levels (UnetModified.py:262-275); concat always changes channels
    torch_idx = 0
    for ind in reversed(range(num_mults)):
        use_attn = ind in attn_layer
        for _ in range(res_blocks + 1):
            params[f"ResnetBlocWithAttn_{k}"] = _convert_rbwa(
                sd, f"ups.{torch_idx}", True, use_attn
            )
            k += 1
            torch_idx += 1
        if ind >= 1:
            params[f"Upsample_{us}"] = {
                "Conv_0": _conv(
                    sd[f"ups.{torch_idx}.conv.weight"],
                    sd[f"ups.{torch_idx}.conv.bias"],
                )
            }
            us += 1
            torch_idx += 1

    params["Block_0"] = {
        "GroupNorm_0": _norm(
            sd["final_conv.block.0.weight"], sd["final_conv.block.0.bias"]
        ),
        "Conv_0": _conv(
            sd["final_conv.block.3.weight"]
            if "final_conv.block.3.weight" in sd
            else sd["final_conv.block.2.weight"],
            sd["final_conv.block.3.bias"]
            if "final_conv.block.3.bias" in sd
            else sd["final_conv.block.2.bias"],
        ),
    }
    return {"params": params}


def import_unet_modified2_state(
    state_dict: Mapping[str, "np.ndarray"],
    channel_mults=(1, 2, 3, 4, 5),
    res_blocks: int = 1,
    inner_channel: int = 32,
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference UNetModified2 state_dict to flax params
    ``{"params": ...}`` for :class:`sddm_tpu.models.UNetModified2`.

    ``channel_mults``/``res_blocks``/``inner_channel`` must match the config
    the checkpoint was trained with (network.args in its config.json).
    """
    sd = _strip_prefix(state_dict, prefix)

    params: Dict = {}
    # noise MLP: Sequential(PE, Linear, Swish, Linear, Swish)
    params["NoiseLevelMLP_0"] = {
        "Dense_0": _dense(
            sd["noise_level_mlp.1.weight"], sd["noise_level_mlp.1.bias"]
        ),
        "Dense_1": _dense(
            sd["noise_level_mlp.3.weight"], sd["noise_level_mlp.3.bias"]
        ),
    }
    # first conv = downs.0
    params["Conv_0"] = _conv(sd["downs.0.weight"], sd["downs.0.bias"])

    rb = 0  # flax ResnetBlock counter
    ds = 0  # Downsample counter
    us = 0  # Upsample counter
    torch_idx = 1  # position within reference downs ModuleList

    # encoder: per level res_blocks ResnetBlocks + 1 Downsample
    n_in = inner_channel
    for mult in channel_mults:
        n_out = inner_channel * mult
        for _ in range(res_blocks):
            params[f"ResnetBlock_{rb}"] = _convert_resnet_block(
                sd, f"downs.{torch_idx}", has_res_conv=(n_in != n_out)
            )
            n_in = n_out
            rb += 1
            torch_idx += 1
        params[f"Downsample_{ds}"] = {
            "Conv_0": _conv(
                sd[f"downs.{torch_idx}.conv.weight"],
                sd[f"downs.{torch_idx}.conv.bias"],
            )
        }
        ds += 1
        torch_idx += 1

    # mid: 1 ResnetBlock (same in/out channels -> no res_conv)
    params[f"ResnetBlock_{rb}"] = _convert_resnet_block(
        sd, "mid.0", has_res_conv=False
    )
    rb += 1

    # decoder (reference ups ordering: [skip-Resnet, Upsample,
    # res_blocks x skip-Resnet] per level, model/UNetModified2.py:208-232)
    torch_idx = 0
    num_mults = len(channel_mults)
    for i, ind in enumerate(reversed(range(num_mults))):
        params[f"ResnetBlock_{rb}"] = _convert_resnet_block(
            sd, f"ups.{torch_idx}", has_res_conv=True
        )
        rb += 1
        torch_idx += 1
        params[f"Upsample_{us}"] = {
            "Conv_0": _conv(
                sd[f"ups.{torch_idx}.conv.weight"],
                sd[f"ups.{torch_idx}.conv.bias"],
            )
        }
        us += 1
        torch_idx += 1
        for _ in range(res_blocks):
            params[f"ResnetBlock_{rb}"] = _convert_resnet_block(
                sd, f"ups.{torch_idx}", has_res_conv=True
            )
            rb += 1
            torch_idx += 1

    # final conv Block
    params["Block_0"] = {
        "GroupNorm_0": _norm(
            sd["final_conv.block.0.weight"], sd["final_conv.block.0.bias"]
        ),
        "Conv_0": _conv(
            sd["final_conv.block.3.weight"]
            if "final_conv.block.3.weight" in sd
            else sd["final_conv.block.2.weight"],
            sd["final_conv.block.3.bias"]
            if "final_conv.block.3.bias" in sd
            else sd["final_conv.block.2.bias"],
        ),
    }
    return {"params": params}


def _convert_block(sd: Mapping, prefix: str) -> Dict:
    """Reference Block Sequential: GroupNorm(0), Swish(1), Dropout/Identity
    (2), Conv (3; or 2 in older checkpoints without the dropout slot)."""
    return {
        "GroupNorm_0": _norm(
            sd[f"{prefix}.block.0.weight"], sd[f"{prefix}.block.0.bias"]
        ),
        "Conv_0": _conv(
            sd[f"{prefix}.block.3.weight"]
            if f"{prefix}.block.3.weight" in sd
            else sd[f"{prefix}.block.2.weight"],
            sd[f"{prefix}.block.3.bias"]
            if f"{prefix}.block.3.bias" in sd
            else sd[f"{prefix}.block.2.bias"],
        ),
    }


def _convert_vrb(sd: Mapping, prefix: str, has_res_conv: bool) -> Dict:
    """Variable-noise ResnetBlock (UNetModified2_withVariableNoiseLevel.py:
    93-110): noise injected additively via a 1x1 conv on the per-segment
    embedding (no FeatureWiseAffine)."""
    out = {
        "Block_0": _convert_block(sd, f"{prefix}.block1"),
        "Conv_0": _conv(
            sd[f"{prefix}.noise_func.weight"], sd[f"{prefix}.noise_func.bias"]
        ),
        "Block_1": _convert_block(sd, f"{prefix}.block2"),
    }
    if has_res_conv:
        out["Conv_1"] = _conv(
            sd[f"{prefix}.res_conv.weight"], sd[f"{prefix}.res_conv.bias"]
        )
    return out


def import_unet_variable_state(
    state_dict: Mapping[str, "np.ndarray"],
    channel_mults=(1, 2, 3, 4, 5),
    res_blocks: int = 3,
    inner_channel: int = 32,
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference UNetModified2_VariableNoiseLevel state_dict
    (model/UNetModified2_withVariableNoiseLevel.py:114-242) to flax params
    for :class:`sddm_tpu.models.UNetModified2_VariableNoiseLevel`."""
    sd = _strip_prefix(state_dict, prefix)

    params: Dict = {
        "NoiseLevelConvMLP_0": {
            "Conv_0": _conv(
                sd["noise_level_mlp.1.weight"], sd["noise_level_mlp.1.bias"]
            ),
            "Conv_1": _conv(
                sd["noise_level_mlp.3.weight"], sd["noise_level_mlp.3.bias"]
            ),
        },
        "Conv_0": _conv(sd["first_conv.weight"], sd["first_conv.bias"]),
    }

    rb = ds = us = 0
    torch_idx = 0
    n_in = inner_channel
    num_mults = len(channel_mults)
    # encoder: res_blocks blocks + a Downsample per level (EVERY level,
    # including the last — unlike UNetModified)
    for mult in channel_mults:
        n_out = inner_channel * mult
        for _ in range(res_blocks):
            params[f"VariableResnetBlock_{rb}"] = _convert_vrb(
                sd, f"downs.{torch_idx}", n_in != n_out
            )
            n_in = n_out
            rb += 1
            torch_idx += 1
        params[f"Downsample_{ds}"] = {
            "Conv_0": _conv(
                sd[f"downs.{torch_idx}.conv.weight"],
                sd[f"downs.{torch_idx}.conv.bias"],
            )
        }
        params[f"DownsampleNoiseLevel_{ds}"] = {
            "Conv_0": _conv(
                sd[f"noise_level_down.{ds}.down.0.weight"],
                sd[f"noise_level_down.{ds}.down.0.bias"],
            )
        }
        ds += 1
        torch_idx += 1

    params[f"VariableResnetBlock_{rb}"] = _convert_vrb(sd, "mid.0", False)
    rb += 1

    # decoder: [skip-Resnet, Upsample(+noise pyramid), res_blocks x
    # skip-Resnet] per level; concat always changes channels
    torch_idx = 0
    for _ in reversed(range(num_mults)):
        params[f"VariableResnetBlock_{rb}"] = _convert_vrb(
            sd, f"ups.{torch_idx}", True
        )
        rb += 1
        torch_idx += 1
        params[f"Upsample_{us}"] = {
            "Conv_0": _conv(
                sd[f"ups.{torch_idx}.conv.weight"],
                sd[f"ups.{torch_idx}.conv.bias"],
            )
        }
        params[f"UpsampleNoiseLevel_{us}"] = {
            "Conv_0": _conv(
                sd[f"noise_level_up.{us}.up.1.weight"],
                sd[f"noise_level_up.{us}.up.1.bias"],
            )
        }
        us += 1
        torch_idx += 1
        for _ in range(res_blocks):
            params[f"VariableResnetBlock_{rb}"] = _convert_vrb(
                sd, f"ups.{torch_idx}", True
            )
            rb += 1
            torch_idx += 1

    params["Block_0"] = _convert_block(sd, "final_conv")
    return {"params": params}


def import_unet_sp_state(
    state_dict: Mapping[str, "np.ndarray"],
    channel_mults=(1, 2, 3, 4, 5),
    res_blocks: int = 3,
    inner_channel: int = 32,
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference UNetSP state_dict (model/UNet_SubpixelConv.py:
    141-267, sub-pixel-shuffle decoder) to flax params for
    :class:`sddm_tpu.models.UNetSP`."""
    sd = _strip_prefix(state_dict, prefix)

    params: Dict = {
        # PE -> Linear(4x) -> Swish -> Linear — no final Swish (:162-167)
        "Dense_0": _dense(
            sd["noise_level_mlp.1.weight"], sd["noise_level_mlp.1.bias"]
        ),
        "Dense_1": _dense(
            sd["noise_level_mlp.3.weight"], sd["noise_level_mlp.3.bias"]
        ),
        "Conv_0": _conv(sd["downs.0.weight"], sd["downs.0.bias"]),
    }

    rb = ds = 0
    torch_idx = 1
    n_in = inner_channel
    # encoder: res_blocks ResnetBlocks + a Downsample per level (every
    # level, :180-192)
    for mult in channel_mults:
        n_out = inner_channel * mult
        for _ in range(res_blocks):
            params[f"ResnetBlock_{rb}"] = _convert_resnet_block(
                sd, f"downs.{torch_idx}", n_in != n_out
            )
            n_in = n_out
            rb += 1
            torch_idx += 1
        params[f"Downsample_{ds}"] = {
            "Conv_0": _conv(
                sd[f"downs.{torch_idx}.conv.weight"],
                sd[f"downs.{torch_idx}.conv.bias"],
            )
        }
        ds += 1
        torch_idx += 1

    params[f"ResnetBlock_{rb}"] = _convert_resnet_block(sd, "mid.0", False)
    rb += 1

    # decoder: [skip-Resnet -> 4x channels, PixelShuffle (no params),
    # res_blocks skip-Resnets] per level (:203-229); concat always changes
    # channels so every decoder block has a res_conv
    torch_idx = 0
    for _ in reversed(range(len(channel_mults))):
        for block_i in range(res_blocks + 1):
            params[f"ResnetBlock_{rb}"] = _convert_resnet_block(
                sd, f"ups.{torch_idx}", True
            )
            rb += 1
            torch_idx += 1
            if block_i == 0:
                torch_idx += 1  # skip the parameterless Upsample module slot

    params["Block_0"] = {
        "GroupNorm_0": _norm(
            sd["final_conv.block.0.weight"], sd["final_conv.block.0.bias"]
        ),
        "Conv_0": _conv(
            sd["final_conv.block.3.weight"]
            if "final_conv.block.3.weight" in sd
            else sd["final_conv.block.2.weight"],
            sd["final_conv.block.3.bias"]
            if "final_conv.block.3.bias" in sd
            else sd["final_conv.block.2.bias"],
        ),
    }
    return {"params": params}


def import_unet_tst_state(
    state_dict: Mapping[str, "np.ndarray"],
    channel_mults=(1, 2, 3, 4, 5),
    res_blocks: int = 3,
    inner_channel: int = 32,
    n_TSTB: int = 6,
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference UNetTST state_dict (model/UNetTST.py:270-392,
    UNetModified2-style encoder/decoder around a Dual_Transformer mid) to
    flax params for :class:`sddm_tpu.models.UNetTST`."""
    from .zoo_import import _conv2d, _encoder_layer, _lnorm, _prelu

    sd = _strip_prefix(state_dict, prefix)

    params: Dict = {
        "Dense_0": _dense(
            sd["noise_level_mlp.1.weight"], sd["noise_level_mlp.1.bias"]
        ),
        "Dense_1": _dense(
            sd["noise_level_mlp.3.weight"], sd["noise_level_mlp.3.bias"]
        ),
        "Conv_0": _conv(sd["downs.0.weight"], sd["downs.0.bias"]),
    }

    rb = ds = us = 0
    torch_idx = 1
    n_in = inner_channel
    for mult in channel_mults:
        n_out = inner_channel * mult
        for _ in range(res_blocks):
            params[f"ResnetBlock_{rb}"] = _convert_resnet_block(
                sd, f"downs.{torch_idx}", n_in != n_out
            )
            n_in = n_out
            rb += 1
            torch_idx += 1
        params[f"Downsample_{ds}"] = {
            "Conv_0": _conv(
                sd[f"downs.{torch_idx}.conv.weight"],
                sd[f"downs.{torch_idx}.conv.bias"],
            )
        }
        ds += 1
        torch_idx += 1

    # mid Dual_Transformer: shared-slope PReLUs, output Conv THEN PReLU
    # (UNetTST.py:190-210)
    mid: Dict = {
        "Conv_0": _conv2d(sd, "mid.input.0"),
        "PReLU_0": _prelu(sd, "mid.input.1"),
        "Conv_1": _conv2d(sd, "mid.output.0"),
        "PReLU_1": _prelu(sd, "mid.output.1"),
    }
    for i in range(n_TSTB):
        mid[f"TransformerEncoderLayerGRU_{2 * i}"] = _encoder_layer(
            sd, f"mid.row_trans.{i}"
        )
        mid[f"TransformerEncoderLayerGRU_{2 * i + 1}"] = _encoder_layer(
            sd, f"mid.col_trans.{i}"
        )
        mid[f"GroupNorm1_{2 * i}"] = _lnorm(sd, f"mid.row_norm.{i}")
        mid[f"GroupNorm1_{2 * i + 1}"] = _lnorm(sd, f"mid.col_norm.{i}")
    params["DualTransformer_0"] = mid

    torch_idx = 0
    for _ in reversed(range(len(channel_mults))):
        params[f"ResnetBlock_{rb}"] = _convert_resnet_block(
            sd, f"ups.{torch_idx}", True
        )
        rb += 1
        torch_idx += 1
        params[f"Upsample_{us}"] = {
            "Conv_0": _conv(
                sd[f"ups.{torch_idx}.conv.weight"],
                sd[f"ups.{torch_idx}.conv.bias"],
            )
        }
        us += 1
        torch_idx += 1
        for _ in range(res_blocks):
            params[f"ResnetBlock_{rb}"] = _convert_resnet_block(
                sd, f"ups.{torch_idx}", True
            )
            rb += 1
            torch_idx += 1

    params["Block_0"] = _convert_block(sd, "final_conv")
    return {"params": params}


def _convert_snr_resnet(sd: Mapping, prefix: str, has_res_conv: bool) -> Dict:
    """SNR-estimator ResnetBlock: single Block + optional res_conv, no noise
    injection (snr_estimator.py:37-47)."""
    out = {"Block_0": _convert_block(sd, f"{prefix}.block1")}
    if has_res_conv:
        out["Conv_0"] = _conv(
            sd[f"{prefix}.res_conv.weight"], sd[f"{prefix}.res_conv.bias"]
        )
    return out


def import_snr_estimator_state(
    state_dict: Mapping[str, "np.ndarray"],
    channel_mults=(1, 2, 3, 4, 5),
    res_blocks: int = 3,
    inner_channel: int = 32,
    prefix: str = "snr_estimator.",
) -> Dict:
    """Convert a reference SNREstimator state_dict (model/snr_estimator.py:
    70-129) to flax params for :class:`sddm_tpu.models.SNREstimator`.

    The SNRBlock dense head needs a permutation: torch flattens its
    [B, C, N', 1] conv output channel-major (index c*N'+n) while the NHWC
    implementation flattens segment-major (n*C+c)."""
    sd = _strip_prefix(state_dict, prefix)

    params: Dict = {
        "Conv_0": _conv(sd["downs.0.weight"], sd["downs.0.bias"]),
    }
    rb = ds = 0
    torch_idx = 1
    n_in = inner_channel
    for mult in channel_mults:
        n_out = inner_channel * mult
        for _ in range(res_blocks):
            params[f"SNRResnetBlock_{rb}"] = _convert_snr_resnet(
                sd, f"downs.{torch_idx}", n_in != n_out
            )
            n_in = n_out
            rb += 1
            torch_idx += 1
        params[f"Downsample_{ds}"] = {
            "Conv_0": _conv(
                sd[f"downs.{torch_idx}.conv.weight"],
                sd[f"downs.{torch_idx}.conv.bias"],
            )
        }
        ds += 1
        torch_idx += 1

    params[f"SNRResnetBlock_{rb}"] = _convert_snr_resnet(sd, "mid.0", False)

    dw = np.asarray(sd["final_block.dense.weight"])  # [out, C*N']
    db = np.asarray(sd["final_block.dense.bias"])
    c_out = np.asarray(sd["final_block.block.0.weight"]).shape[0]
    n_prime = dw.shape[1] // c_out
    kernel = (
        dw.reshape(dw.shape[0], c_out, n_prime)  # [out, C, N']
        .transpose(2, 1, 0)                       # [N', C, out]
        .reshape(n_prime * c_out, dw.shape[0])
    )
    params["SNRBlock_0"] = {
        "Conv_0": _conv(
            sd["final_block.block.0.weight"], sd["final_block.block.0.bias"]
        ),
        "GroupNorm_0": _norm(
            sd["final_block.block.1.weight"], sd["final_block.block.1.bias"]
        ),
        "Dense_0": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(db)},
    }
    return {"params": params}
