"""UNet-2D-condition zoo model vs a torch twin implementing the diffusers /
reference semantics (analog of reference: tensorrt_llm/models/unet/ — tested
the reference repo's torch_ref.py way since diffusers is not baked in)."""

import math

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from whisper_trtllm_tpu.models.unet import (
    UNetConfig,
    forward,
    init_params,
    timestep_embedding,
)


def _t(a):
    return torch.from_numpy(np.asarray(a)).double()


def _tconv(p, x, stride=1, padding=0):
    w = _t(p["kernel"]).permute(3, 2, 0, 1)  # HWIO → OIHW
    return F.conv2d(x, w, _t(p["bias"]), stride=stride, padding=padding)


def _tlin(p, x):
    y = x @ _t(p["kernel"])
    return y + _t(p["bias"]) if "bias" in p else y


def _tgn(p, x, groups, eps):
    return F.group_norm(x, groups, _t(p["scale"]), _t(p["bias"]), eps)


def _tln(p, x):
    return F.layer_norm(x, (x.shape[-1],), _t(p["scale"]), _t(p["bias"]))


def _tresnet(p, cfg, x, temb):
    h = F.silu(_tgn(p["norm1"], x, cfg.norm_num_groups, cfg.resnet_eps))
    h = _tconv(p["conv1"], h, padding=1)
    h = h + _tlin(p["time_emb_proj"], F.silu(temb))[:, :, None, None]
    h = F.silu(_tgn(p["norm2"], h, cfg.norm_num_groups, cfg.resnet_eps))
    h = _tconv(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = _tconv(p["conv_shortcut"], x)
    return x + h


def _tattn(p, x, ctx, heads):
    b, s, c = x.shape
    ctx = x if ctx is None else ctx
    dh = c // heads

    def sh(t):
        return t.reshape(b, -1, heads, dh).permute(0, 2, 1, 3)

    q, k, v = sh(_tlin(p["q"], x)), sh(_tlin(p["k"], ctx)), sh(_tlin(p["v"], ctx))
    a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(dh), dim=-1) @ v
    return _tlin(p["out"], a.permute(0, 2, 1, 3).reshape(b, s, c))


def _ttransformer(p, cfg, x, ctx):
    b, c, hh, ww = x.shape
    residual = x
    h = _tgn(p["norm"], x, cfg.norm_num_groups, 1e-6)
    h = _tconv(p["proj_in"], h)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    for blk in p["blocks"]:
        h = h + _tattn(blk["attn1"], _tln(blk["norm1"], h), None,
                       cfg.attention_head_dim)
        h = h + _tattn(blk["attn2"], _tln(blk["norm2"], h), ctx,
                       cfg.attention_head_dim)
        ff = _tlin(blk["ff_in"], _tln(blk["norm3"], h))
        a, gate = ff.chunk(2, dim=-1)
        h = h + _tlin(blk["ff_out"], a * F.gelu(gate))
    h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    return _tconv(p["proj_out"], h) + residual


def _torch_unet(params, cfg, sample_nhwc, timesteps, ctx):
    x = _t(sample_nhwc).permute(0, 3, 1, 2)
    ctx = _t(ctx)
    half = cfg.block_out_channels[0] // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half).double() / (half - cfg.freq_shift))
    args = _t(timesteps)[:, None] * freqs[None]
    temb = torch.cat([args.cos(), args.sin()], dim=-1)
    temb = _tlin(params["time_mlp_2"], F.silu(_tlin(params["time_mlp_1"], temb)))

    x = _tconv(params["conv_in"], x, padding=1)
    stack = [x]
    for blk, btype in zip(params["down"], cfg.down_block_types):
        for j, rp in enumerate(blk["resnets"]):
            x = _tresnet(rp, cfg, x, temb)
            if btype == "CrossAttnDownBlock2D":
                x = _ttransformer(blk["attns"][j], cfg, x, ctx)
            stack.append(x)
        if "downsample" in blk:
            x = _tconv(blk["downsample"], x, stride=2, padding=1)
            stack.append(x)
    mid = params["mid"]
    x = _tresnet(mid["resnets"][0], cfg, x, temb)
    for ap, rp in zip(mid["attns"], mid["resnets"][1:]):
        x = _ttransformer(ap, cfg, x, ctx)
        x = _tresnet(rp, cfg, x, temb)
    for blk, btype in zip(params["up"], cfg.up_block_types):
        for j, rp in enumerate(blk["resnets"]):
            x = torch.cat([x, stack.pop()], dim=1)
            x = _tresnet(rp, cfg, x, temb)
            if btype == "CrossAttnUpBlock2D":
                x = _ttransformer(blk["attns"][j], cfg, x, ctx)
        if "upsample" in blk:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = _tconv(blk["upsample"], x, padding=1)
    x = F.silu(_tgn(params["conv_norm_out"], x, cfg.norm_num_groups,
                    cfg.norm_eps))
    x = _tconv(params["conv_out"], x, padding=1)
    return x.permute(0, 2, 3, 1).numpy()


@pytest.fixture(scope="module")
def unet_pair():
    cfg = UNetConfig.testing()
    return init_params(cfg, seed=0), cfg


def test_timestep_embedding(unet_pair):
    _, cfg = unet_pair
    ts = np.array([0.0, 5.0, 999.0], np.float32)
    emb = np.asarray(timestep_embedding(cfg, ts))
    half = cfg.block_out_channels[0] // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / (half - cfg.freq_shift))
    ref = np.concatenate(
        [np.cos(ts[:, None] * freqs), np.sin(ts[:, None] * freqs)], axis=-1)
    # fp32 trig at arg≈1000 carries ~arg·eps error vs the float64 reference
    np.testing.assert_allclose(emb, ref.astype(np.float32), atol=5e-4)


def test_forward_parity(unet_pair, rng):
    params, cfg = unet_pair
    sample = rng.standard_normal((2, 16, 16, cfg.in_channels)).astype(np.float32)
    ctx = rng.standard_normal((2, 3, cfg.cross_attention_dim)).astype(np.float32)
    ts = np.array([5.0, 999.0], np.float32)
    ours = np.asarray(jax.jit(
        lambda p, s, t, c: forward(p, cfg, s, t, c)
    )(params, sample, ts, ctx))
    theirs = _torch_unet(params, cfg, sample, ts, ctx)
    assert ours.shape == (2, 16, 16, cfg.out_channels)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)


def test_unet_full_sd_topology(rng):
    """SD-1.x depth (4 stages, 3 downsamples) at toy widths: checks the
    residual-stack bookkeeping across all block types and spatial sizes."""
    cfg = UNetConfig.testing(
        block_out_channels=(8, 8, 16, 16),
        down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                          "CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D",
                        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
        norm_num_groups=4, attention_head_dim=1, cross_attention_dim=8,
    )
    params = init_params(cfg, seed=1)
    sample = rng.standard_normal((1, 32, 32, 4)).astype(np.float32)
    ctx = rng.standard_normal((1, 2, 8)).astype(np.float32)
    ts = np.array([7.0], np.float32)
    out = np.asarray(forward(params, cfg, sample, ts, ctx))
    assert out.shape == (1, 32, 32, 4)
    theirs = _torch_unet(params, cfg, sample, ts, ctx)
    np.testing.assert_allclose(out, theirs, atol=2e-4, rtol=2e-4)
