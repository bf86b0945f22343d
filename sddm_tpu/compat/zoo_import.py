"""Import reference PyTorch checkpoints for the denoiser zoo beyond the
flagship: DiffWave, WaveGrad, TSTNN — three distinct architecture families
(dilated-conv vocoder / FiLM+resample / dual-path transformer with GRU FFN).

Layout conversions (torch -> flax):
  - Conv1d  [O, I, k]        -> [k, I, O]
  - Conv2d  [O, I, kh, kw]   -> [kh, kw, I, O]
  - ConvTranspose2d [I, O, kh, kw] -> [kh, kw, I, O] with SPATIAL FLIP
    (flax ConvTranspose runs a fractionally-strided conv with the kernel
    as-is; torch's transposed conv correlates with the flipped kernel)
  - Linear  [O, I]           -> [I, O]
  - MultiheadAttention in_proj [3E, E] -> per-head q/k/v kernels
    [E, heads, head_dim]; out_proj [E, E] -> [heads, head_dim, E]
  - GRU (gate order r,z,n): weight_ih [3H, E] -> ir/iz/in kernels [E, H];
    weight_hh [3H, H] -> hr/hz/hn kernels; b_hr/b_hz are folded into
    ir/iz biases (flax's recurrent r/z denses are bias-free; the math is
    identical because the two linears are summed).

Used by tests/test_zoo_import.py to prove elementwise forward parity vs the
reference implementations (reference model/diffwave.py:111-155,
model/wavegrad.py:140-179, model/tstnn.py:216-299).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(v):
    # copy: torch tensors expose aligned numpy views; without the copy the
    # imported params would alias live torch memory (see torch_import.py)
    return np.array(v)


def _conv1d(sd, name):
    w = _np(sd[f"{name}.weight"])
    return {"kernel": w.transpose(2, 1, 0), "bias": _np(sd[f"{name}.bias"])}


def _conv2d(sd, name):
    w = _np(sd[f"{name}.weight"])
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": _np(sd[f"{name}.bias"])}


def _convT2d(sd, name):
    w = _np(sd[f"{name}.weight"])  # [I, O, kh, kw]
    k = w.transpose(2, 3, 0, 1)[::-1, ::-1]  # spatial flip, keep [I, O]
    return {"kernel": np.ascontiguousarray(k),
            "bias": _np(sd[f"{name}.bias"])}


def _dense(sd, name):
    w = _np(sd[f"{name}.weight"])
    return {"kernel": w.transpose(1, 0), "bias": _np(sd[f"{name}.bias"])}


def _lnorm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"])}


def _prelu(sd, name):
    return {"alpha": _np(sd[f"{name}.weight"])}


# ---------------------------------------------------------------------------
# DiffWave (reference model/diffwave.py:111-155)
# ---------------------------------------------------------------------------

def import_diffwave_state(
    state_dict: Mapping[str, "np.ndarray"],
    residual_layers: int = 30,
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference DiffWave state_dict to flax params for
    :class:`sddm_tpu.models.DiffWave`."""
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}

    params: Dict = {
        "Conv_0": _conv1d(sd, "input_projection"),
        "DiffusionEmbedding_0": {
            "Dense_0": _dense(sd, "diffusion_embedding.projection1"),
            "Dense_1": _dense(sd, "diffusion_embedding.projection2"),
        },
        "SpectrogramUpsampler_0": {
            "ConvTranspose_0": _convT2d(sd, "spectrogram_upsampler.conv1"),
            "ConvTranspose_1": _convT2d(sd, "spectrogram_upsampler.conv2"),
        },
        "Conv_1": _conv1d(sd, "skip_projection"),
        "Conv_2": _conv1d(sd, "output_projection"),
    }
    for i in range(residual_layers):
        p = f"residual_layers.{i}"
        params[f"ResidualBlock_{i}"] = {
            "Dense_0": _dense(sd, f"{p}.diffusion_projection"),
            "Conv_0": _conv1d(sd, f"{p}.dilated_conv"),
            "Conv_1": _conv1d(sd, f"{p}.conditioner_projection"),
            "Conv_2": _conv1d(sd, f"{p}.output_residual"),
            "Conv_3": _conv1d(sd, f"{p}.output_projection"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# WaveGrad (reference model/wavegrad.py:140-179)
# ---------------------------------------------------------------------------

def _film(sd, name):
    return {"Conv_0": _conv1d(sd, f"{name}.input_conv"),
            "Conv_1": _conv1d(sd, f"{name}.output_conv")}


def _dblock(sd, name):
    return {
        "Conv_0": _conv1d(sd, f"{name}.residual_dense"),
        "Conv_1": _conv1d(sd, f"{name}.conv.0"),
        "Conv_2": _conv1d(sd, f"{name}.conv.1"),
        "Conv_3": _conv1d(sd, f"{name}.conv.2"),
    }


def _ublock(sd, name):
    return {
        "Conv_0": _conv1d(sd, f"{name}.block1"),
        "Conv_1": _conv1d(sd, f"{name}.block2.0"),
        "Conv_2": _conv1d(sd, f"{name}.block2.1"),
        "Conv_3": _conv1d(sd, f"{name}.block3.0"),
        "Conv_4": _conv1d(sd, f"{name}.block3.1"),
    }


def import_wavegrad_state(
    state_dict: Mapping[str, "np.ndarray"],
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference WaveGrad state_dict to flax params for
    :class:`sddm_tpu.models.WaveGrad` (fixed topology: 4 DBlocks, 5 FiLMs,
    5 UBlocks, wavegrad.py:140-165)."""
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}

    params: Dict = {
        "Conv_0": _conv1d(sd, "downsample.0"),
        "Conv_1": _conv1d(sd, "first_conv"),
        "Conv_2": _conv1d(sd, "last_conv"),
    }
    for i in range(5):
        params[f"FiLM_{i}"] = _film(sd, f"film.{i}")
        params[f"UBlock_{i}"] = _ublock(sd, f"upsample.{i}")
    for i in range(4):
        params[f"DBlock_{i}"] = _dblock(sd, f"downsample.{i + 1}")
    return {"params": params}


# ---------------------------------------------------------------------------
# TSTNN (reference model/tstnn.py:216-299)
# ---------------------------------------------------------------------------

def _mha(sd, name, nhead):
    w = _np(sd[f"{name}.in_proj_weight"])  # [3E, E]
    b = _np(sd[f"{name}.in_proj_bias"])
    e = w.shape[1]
    hd = e // nhead

    def proj(idx):
        wi = w[idx * e:(idx + 1) * e]  # [E, E], applied as x @ wi.T
        bi = b[idx * e:(idx + 1) * e]
        return {"kernel": wi.T.reshape(e, nhead, hd),
                "bias": bi.reshape(nhead, hd)}

    ow = _np(sd[f"{name}.out_proj.weight"])  # [E, E]
    return {
        "query": proj(0), "key": proj(1), "value": proj(2),
        "out": {"kernel": ow.T.reshape(nhead, hd, e),
                "bias": _np(sd[f"{name}.out_proj.bias"])},
    }


def _gru_cell(sd, name, suffix=""):
    """One direction of a torch GRU layer -> flax GRUCell params.
    torch gate order is (r, z, n); b_hr/b_hz fold into ir/iz biases."""
    w_ih = _np(sd[f"{name}.weight_ih_l0{suffix}"])  # [3H, E]
    w_hh = _np(sd[f"{name}.weight_hh_l0{suffix}"])  # [3H, H]
    b_ih = _np(sd[f"{name}.bias_ih_l0{suffix}"])
    b_hh = _np(sd[f"{name}.bias_hh_l0{suffix}"])
    h = w_hh.shape[1]
    wir, wiz, win = w_ih[:h], w_ih[h:2 * h], w_ih[2 * h:]
    whr, whz, whn = w_hh[:h], w_hh[h:2 * h], w_hh[2 * h:]
    bir, biz, bin_ = b_ih[:h], b_ih[h:2 * h], b_ih[2 * h:]
    bhr, bhz, bhn = b_hh[:h], b_hh[h:2 * h], b_hh[2 * h:]
    return {
        "ir": {"kernel": wir.T, "bias": bir + bhr},
        "iz": {"kernel": wiz.T, "bias": biz + bhz},
        "in": {"kernel": win.T, "bias": bin_},
        "hr": {"kernel": whr.T},
        "hz": {"kernel": whz.T},
        "hn": {"kernel": whn.T, "bias": bhn},
    }


def _encoder_layer(sd, name, nhead=4):
    return {
        "MultiHeadDotProductAttention_0": _mha(sd, f"{name}.self_attn", nhead),
        "LayerNormLastAxis_0": _lnorm(sd, f"{name}.norm1"),
        "LayerNormLastAxis_1": _lnorm(sd, f"{name}.norm2"),
        "GRUFeedForward_0": {
            "GRUCell_0": _gru_cell(sd, f"{name}.gru"),
            "GRUCell_1": _gru_cell(sd, f"{name}.gru", "_reverse"),
            "Dense_0": _dense(sd, f"{name}.linear2"),
        },
    }


def _dense_block(sd, name, depth=4):
    out = {}
    for i in range(depth):
        out[f"Conv_{i}"] = _conv2d(sd, f"{name}.conv{i + 1}")
        out[f"LayerNormLastAxis_{i}"] = _lnorm(sd, f"{name}.norm{i + 1}")
        out[f"PReLU_{i}"] = _prelu(sd, f"{name}.prelu{i + 1}")
    return out


def _ca_fwa(sd, name):
    """CAUNet FeatureWiseAffine MLP: Linear -> PReLU -> Linear
    (CAUNet.py:59-79)."""
    return {
        "Dense_0": _dense(sd, f"{name}.noise_func.0"),
        "PReLU_0": _prelu(sd, f"{name}.noise_func.1"),
        "Dense_1": _dense(sd, f"{name}.noise_func.2"),
    }


def import_caunet_state(
    state_dict: Mapping[str, "np.ndarray"],
    n_encode_layers: int = 4,
    dense_depth: int = 3,
    n_TSTB: int = 6,
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference CAUNet state_dict to flax params for
    :class:`sddm_tpu.models.CAUNet` (reference model/CAUNet.py:307-375)."""
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}

    mid: Dict = {
        "Conv_0": _conv2d(sd, "mid.input.0"),
        "PReLU_0": _prelu(sd, "mid.input.1"),
        # CAUNet's Dual_Transformer output is Conv THEN PReLU
        # (CAUNet.py:174-177; TSTNN's is the reverse)
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

    params: Dict = {
        "Conv_0": _conv2d(sd, "first_conv"),
        "DualTransformer_0": mid,
        "Conv_1": _conv2d(sd, "final_conv"),
    }
    for i in range(n_encode_layers):
        params[f"EncodeLayer_{i}"] = {
            "CAFeatureWiseAffine_0": _ca_fwa(sd, f"downs.{i}.noise_func"),
            "DenseBlock_0": _dense_block(
                sd, f"downs.{i}.dense", dense_depth
            ),
            "Conv_0": _conv2d(sd, f"downs.{i}.downsample.0"),
            "LayerNormLastAxis_0": _lnorm(sd, f"downs.{i}.downsample.1"),
            "PReLU_0": _prelu(sd, f"downs.{i}.downsample.2"),
        }
        params[f"DecodeLayer_{i}"] = {
            "CAFeatureWiseAffine_0": _ca_fwa(sd, f"ups.{i}.noise_func"),
            "DenseBlock_0": _dense_block(sd, f"ups.{i}.dense", dense_depth),
            "SPConvTranspose2d_0": {
                "Conv_0": _conv2d(sd, f"ups.{i}.upsample.0.conv")
            },
            "LayerNormLastAxis_0": _lnorm(sd, f"ups.{i}.upsample.1"),
            "PReLU_0": _prelu(sd, f"ups.{i}.upsample.2"),
        }
    return {"params": params}


def import_tstnn_state(
    state_dict: Mapping[str, "np.ndarray"],
    num_layers: int = 4,
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference TSTNN state_dict to flax params for
    :class:`sddm_tpu.models.TSTNN`."""
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}

    dual: Dict = {
        "Conv_0": _conv2d(sd, "dual_transformer.input.0"),
        "PReLU_0": _prelu(sd, "dual_transformer.input.1"),
        "PReLU_1": _prelu(sd, "dual_transformer.output.0"),
        "Conv_1": _conv2d(sd, "dual_transformer.output.1"),
    }
    for i in range(num_layers):
        dual[f"TransformerEncoderLayerGRU_{2 * i}"] = _encoder_layer(
            sd, f"dual_transformer.row_trans.{i}"
        )
        dual[f"TransformerEncoderLayerGRU_{2 * i + 1}"] = _encoder_layer(
            sd, f"dual_transformer.col_trans.{i}"
        )
        dual[f"GroupNorm1_{2 * i}"] = _lnorm(
            sd, f"dual_transformer.row_norm.{i}"
        )
        dual[f"GroupNorm1_{2 * i + 1}"] = _lnorm(
            sd, f"dual_transformer.col_norm.{i}"
        )

    params: Dict = {
        "Conv_0": _conv2d(sd, "inp_conv"),
        "LayerNormLastAxis_0": _lnorm(sd, "inp_norm"),
        "PReLU_0": _prelu(sd, "inp_prelu"),
        "DenseBlock_0": _dense_block(sd, "enc_dense1"),
        "Conv_1": _conv2d(sd, "enc_conv1"),
        "LayerNormLastAxis_1": _lnorm(sd, "enc_norm1"),
        "PReLU_1": _prelu(sd, "enc_prelu1"),
        "DualTransformer_0": dual,
        "Conv_2": _conv2d(sd, "output1.0"),
        "Conv_3": _conv2d(sd, "output2.0"),
        "Conv_4": _conv2d(sd, "maskconv"),
        "DenseBlock_1": _dense_block(sd, "dec_dense1"),
        "SPConvTranspose2d_0": {"Conv_0": _conv2d(sd, "dec_conv1.conv")},
        "LayerNormLastAxis_2": _lnorm(sd, "dec_norm1"),
        "PReLU_2": _prelu(sd, "dec_prelu1"),
        "Conv_5": _conv2d(sd, "out_conv"),
    }
    return {"params": params}


# ---------------------------------------------------------------------------
# Waveunet / Waveunet2 (reference model/waveunet.py:358-506, waveunet2.py)
# ---------------------------------------------------------------------------

def _convT1d(sd, name):
    w = _np(sd[f"{name}.weight"])  # torch ConvTranspose1d [I, O, k]
    k = w.transpose(2, 0, 1)[::-1]  # [k, I, O] with spatial flip
    return {"kernel": np.ascontiguousarray(k),
            "bias": _np(sd[f"{name}.bias"])}


def _wu_convlayer(sd, name, conv_type="gn", transpose=False):
    """Reference ConvLayer (waveunet.py:206-245): .filter conv (+ .norm when
    conv_type='gn')."""
    out = {
        ("ConvTranspose_0" if transpose else "Conv_0"):
            (_convT1d if transpose else _conv1d)(sd, f"{name}.filter")
    }
    if conv_type == "gn":
        out["GroupNorm_0"] = _lnorm(sd, f"{name}.norm")
    return out


def _wu_film(sd, name):
    return {"Conv_0": _conv1d(sd, f"{name}.input_conv"),
            "Conv_1": _conv1d(sd, f"{name}.output_conv")}


def import_waveunet_state(
    state_dict: Mapping[str, "np.ndarray"],
    num_levels: int,
    depth: int = 1,
    conv_type: str = "gn",
    res: str = "learned",
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference Waveunet state_dict to flax params for
    :class:`sddm_tpu.models.Waveunet`.

    ``res='fixed'`` sinc filters are non-learned buffers on our side; the
    reference stores them as (frozen) Parameters — they are simply skipped
    (the filter is deterministic from kernel_size/stride)."""
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    W = "waveunet."

    params: Dict = {"Conv_0": _conv1d(sd, f"{W}output_conv")}
    for j in range(depth):
        params[f"ConvLayer_{j}"] = _wu_convlayer(
            sd, f"{W}bottlenecks.{j}", conv_type
        )
    for i in range(num_levels - 1):
        down: Dict = {}
        for j in range(depth):
            down[f"ConvLayer_{j}"] = _wu_convlayer(
                sd, f"{W}downsampling_blocks.{i}.pre_shortcut_convs.{j}",
                conv_type,
            )
            down[f"ConvLayer_{depth + j}"] = _wu_convlayer(
                sd, f"{W}downsampling_blocks.{i}.post_shortcut_convs.{j}",
                conv_type,
            )
        if res != "fixed":
            down[f"ConvLayer_{2 * depth}"] = _wu_convlayer(
                sd, f"{W}downsampling_blocks.{i}.downconv", conv_type
            )
        params[f"_DownBlock_{i}"] = down
        params[f"FiLM1D_{i}"] = _wu_film(sd, f"{W}film_blocks.{i}")

        up: Dict = {}
        base = 0
        if res != "fixed":
            up["ConvLayer_0"] = _wu_convlayer(
                sd, f"{W}upsampling_blocks.{i}.upconv", conv_type,
                transpose=True,
            )
            base = 1
        for j in range(depth):
            up[f"ConvLayer_{base + j}"] = _wu_convlayer(
                sd, f"{W}upsampling_blocks.{i}.pre_shortcut_convs.{j}",
                conv_type,
            )
            up[f"ConvLayer_{base + depth + j}"] = _wu_convlayer(
                sd, f"{W}upsampling_blocks.{i}.post_shortcut_convs.{j}",
                conv_type,
            )
        params[f"_UpBlock_{i}"] = up
    return {"params": params}


# ---------------------------------------------------------------------------
# DenoiseWaveGrad1/2/3 (reference model/wavegrad.py:184-353)
# ---------------------------------------------------------------------------

def import_denoise_wavegrad_state(
    state_dict: Mapping[str, "np.ndarray"],
    version: int,
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference DenoiseWaveGrad{1,2,3} state_dict to flax params
    for :class:`sddm_tpu.models.DenoiseWaveGrad{1,2,3}` (fixed topologies,
    wavegrad.py:184-242 / :245-304 / :307-353).

    Flax compact naming per version (call order in our forward):
      v1: Conv_0 = y stem, Conv_1 = x stem, Conv_2 = last_conv;
          DBlock_0..3 = y branch, DBlock_4..8 = x branch (downsample_x.1..5)
      v2: Conv_0 = stem, Conv_1 = last_conv; DBlock_0..7; FiLM_0..8; UBlock_0..8
      v3: Conv_0 = stem, Conv_1 = last_conv; DBlock_0..3 + DBlock_4 = bottleneck
    """
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    if version == 1:
        n_levels = 5
        params: Dict = {
            "Conv_0": _conv1d(sd, "downsample.0"),
            "Conv_1": _conv1d(sd, "downsample_x.0"),
            "Conv_2": _conv1d(sd, "last_conv"),
        }
        for i in range(4):
            params[f"DBlock_{i}"] = _dblock(sd, f"downsample.{i + 1}")
        for i in range(5):
            params[f"DBlock_{4 + i}"] = _dblock(sd, f"downsample_x.{i + 1}")
    elif version == 2:
        n_levels = 9
        params = {
            "Conv_0": _conv1d(sd, "downsample.0"),
            "Conv_1": _conv1d(sd, "last_conv"),
        }
        for i in range(8):
            params[f"DBlock_{i}"] = _dblock(sd, f"downsample.{i + 1}")
    elif version == 3:
        n_levels = 5
        params = {
            "Conv_0": _conv1d(sd, "downsample.0"),
            "Conv_1": _conv1d(sd, "last_conv"),
        }
        for i in range(4):
            params[f"DBlock_{i}"] = _dblock(sd, f"downsample.{i + 1}")
        params["DBlock_4"] = _dblock(sd, "bottleneck")
    else:
        raise ValueError(f"version must be 1, 2, or 3, got {version}")
    for i in range(n_levels):
        params[f"FiLM_{i}"] = _film(sd, f"film.{i}")
        params[f"UBlock_{i}"] = _ublock(sd, f"upsample.{i}")
    return {"params": params}


# ---------------------------------------------------------------------------
# Waveunet2 (reference model/waveunet2.py:226-324)
# ---------------------------------------------------------------------------

def import_waveunet2_state(
    state_dict: Mapping[str, "np.ndarray"],
    num_levels: int,
    depth: int = 1,
    conv_type: str = "gn",
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference Waveunet2 state_dict to flax params for
    :class:`sddm_tpu.models.Waveunet2`.

    Waveunet2 is structurally the FiLM Wave-U-Net with the resample convs
    wrapped in Up/DownsampleLayer modules (waveunet2.py:125-147), so the keys
    gain ``.down``/``.up`` path segments; strip them and delegate."""
    sd = {
        k.replace(".downconv.down.", ".downconv.")
         .replace(".upconv.up.", ".upconv."): v
        for k, v in state_dict.items()
    }
    return import_waveunet_state(
        sd, num_levels, depth=depth, conv_type=conv_type, res="learned",
        prefix=prefix,
    )


# ---------------------------------------------------------------------------
# Waveunet3 (reference model/waveunet3.py:314-416)
# ---------------------------------------------------------------------------

def _w3_block(sd, name):
    """Block (waveunet3.py:59-70): Sequential(GroupNorm, Swish,
    Dropout|Identity, Conv1d) -> indices 0 and 3."""
    return {"GroupNorm_0": _lnorm(sd, f"{name}.block.0"),
            "Conv_0": _conv1d(sd, f"{name}.block.3")}


def _w3_resnet(sd, name, has_res):
    out = {
        "Block1D_0": _w3_block(sd, f"{name}.block1"),
        "FeatureWiseAffine1D_0": {
            "Dense_0": _dense(sd, f"{name}.noise_func.noise_func.0")
        },
        "Block1D_1": _w3_block(sd, f"{name}.block2"),
    }
    if has_res:
        out["Conv_0"] = _conv1d(sd, f"{name}.res_conv")
    return out


def _w3_attn(sd, name):
    w = _np(sd[f"{name}.qkv.weight"])  # [3C, C, 1], bias-free
    return {"GroupNorm_0": _lnorm(sd, f"{name}.norm"),
            "Conv_0": {"kernel": w.transpose(2, 1, 0)},
            "Conv_1": _conv1d(sd, f"{name}.out")}


def _w3_rbwa(sd, name, has_res, with_attn):
    out = {"ResnetBlock1D_0": _w3_resnet(sd, f"{name}.res_block", has_res)}
    if with_attn:
        out["SelfAttention1D_0"] = _w3_attn(sd, f"{name}.attn")
    return out


def import_waveunet3_state(
    state_dict: Mapping[str, "np.ndarray"],
    num_channels,
    num_inputs: int = 2,
    with_attn: bool = True,
    prefix: str = "noise_estimate_model.",
) -> Dict:
    """Convert a reference Waveunet3 state_dict to flax params for
    :class:`sddm_tpu.models.Waveunet3` (ResnetBlocWithAttn Wave-U-Net,
    waveunet3.py:314-416; additive skips, raw-scalar noise level)."""
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in state_dict.items()}
    W = "waveunet."
    ch = list(num_channels)
    L = len(ch)

    params: Dict = {"Conv_0": _conv1d(sd, f"{W}output_conv")}
    for i in range(L - 1):
        d = f"{W}downsampling_blocks.{i}"
        in_ch = num_inputs if i == 0 else ch[i]
        params[f"ResnetBlocWithAttn1D_{2 * i}"] = _w3_rbwa(
            sd, f"{d}.pre_shortcut.0", in_ch != ch[i], with_attn
        )
        params[f"ResnetBlocWithAttn1D_{2 * i + 1}"] = _w3_rbwa(
            sd, f"{d}.post_shortcut.0", ch[i] != ch[i + 1], with_attn
        )
        params[f"ConvLayer_{i}"] = _wu_convlayer(
            sd, f"{d}.downconv.down", "gn"
        )
    params[f"ResnetBlocWithAttn1D_{2 * (L - 1)}"] = _w3_rbwa(
        sd, f"{W}bottlenecks.0", False, with_attn
    )
    params[f"ResnetBlocWithAttn1D_{2 * L - 1}"] = _w3_rbwa(
        sd, f"{W}bottlenecks.1", False, False  # bottleneck 2 never has attn
    )
    for j in range(L - 1):
        i = L - 1 - j
        u = f"{W}upsampling_blocks.{j}"
        params[f"ConvLayer_{L - 1 + j}"] = _wu_convlayer(
            sd, f"{u}.upconv.up", "gn", transpose=True
        )
        params[f"ResnetBlocWithAttn1D_{2 * L + 2 * j}"] = _w3_rbwa(
            sd, f"{u}.pre_shortcut.0", ch[i] != ch[i - 1], with_attn
        )
        params[f"ResnetBlocWithAttn1D_{2 * L + 2 * j + 1}"] = _w3_rbwa(
            sd, f"{u}.post_shortcut.0", False, with_attn
        )
    return {"params": params}
