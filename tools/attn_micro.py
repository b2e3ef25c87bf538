"""Microbench: Pallas rel-pos attention kernel variants at production shape.

Variants:
  base  — current _attn_kernel_blc (fp32 bias expand dot)
  bf16b — bias expand dot with bf16 inputs / f32 accumulate. The expand
          matrix is 0/1 so each output element is a plain selection of an
          rh value: bf16-in/f32-acc is bit-exact vs the fp32 dot.
Interleaved medians with readback (CLAUDE.md axon ground rules).
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, rel_ref, o_ref, *, scale, hd, grid_h,
            grid_w, bias_bf16, exp_bf16):
    L = q_ref.shape[0]
    pair = q_ref.shape[1] // hd
    rel_step = rel_ref.shape[1] // pair
    for h in range(pair):
        q = q_ref[:, h * hd:(h + 1) * hd]
        k = k_ref[:, h * hd:(h + 1) * hd]
        v = v_ref[:, h * hd:(h + 1) * hd]
        rh = rel_ref[:, h * rel_step:h * rel_step + grid_h]
        rw = rel_ref[:, h * rel_step + grid_h:(h + 1) * rel_step]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

        rows = jax.lax.broadcasted_iota(jnp.int32, (grid_h, L), 0)
        cols_h = jax.lax.broadcasted_iota(jnp.int32, (grid_h, L), 1) \
            // grid_w
        if bias_bf16:
            expand = (rows == cols_h).astype(jnp.bfloat16)
            bias_h = jax.lax.dot(rh, expand,
                                 preferred_element_type=jnp.float32)
            bias_w = pltpu.repeat(rw, L // grid_w, axis=1).astype(
                jnp.float32)
        else:
            expand = (rows == cols_h).astype(jnp.float32)
            bias_h = jax.lax.dot(rh.astype(jnp.float32), expand,
                                 preferred_element_type=jnp.float32)
            bias_w = pltpu.repeat(rw.astype(jnp.float32), L // grid_w,
                                  axis=1)
        s = s + bias_h + bias_w

        m = jnp.max(s, axis=1, keepdims=True)
        if exp_bf16:
            p = jnp.exp((s - m).astype(jnp.bfloat16))
            denom = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            p = (p.astype(jnp.float32) / denom).astype(v.dtype)
        else:
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            p = (p / denom).astype(v.dtype)
        o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[:, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("scale", "grid_hw", "bias_bf16",
                                   "exp_bf16"))
def attn(qkv2, rel, scale, grid_hw, bias_bf16, exp_bf16):
    B, L, C3 = qkv2.shape
    H, W = grid_hw
    hd = 64
    n = C3 // (3 * hd)
    pair = 2
    np_blk = n // pair
    bw = hd * pair
    nh = (n * hd) // bw
    rw_blk = pair * (H + W)
    return pl.pallas_call(
        partial(_kernel, scale=scale, hd=hd, grid_h=H, grid_w=W,
                bias_bf16=bias_bf16, exp_bf16=exp_bf16),
        out_shape=jax.ShapeDtypeStruct((B, L, n * hd), qkv2.dtype),
        grid=(B, np_blk),
        in_specs=[
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, nh + p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, 2 * nh + p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, rw_blk), lambda b, p: (b, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, L, bw), lambda b, p: (b, 0, p),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(qkv2, qkv2, qkv2, rel)


def main():
    from classpose_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    B, L, n, hd, H, W = 100, 1024, 16, 64, 32, 32
    qkv2 = jnp.asarray(
        rng.normal(size=(B, L, 3 * n * hd)).astype(np.float32) * 0.3,
        jnp.bfloat16)
    rel = jnp.asarray(
        rng.normal(size=(B, L, n * (H + W))).astype(np.float32) * 0.3,
        jnp.bfloat16)
    scale = float(hd) ** -0.5

    variants = {
        "base_f32_bias": (False, False),
        "bf16_bias_dot": (True, False),
        "bf16_bias_exp": (True, True),
    }

    outs = {}
    fns = {}
    for name, (bb, eb) in variants.items():
        f = lambda bb=bb, eb=eb: attn(qkv2, rel, scale, (H, W), bb, eb)
        outs[name] = np.asarray(f()[0, :4, :4], np.float32)
        fns[name] = f

    base = outs["base_f32_bias"]
    for name, o in outs.items():
        print(f"{name}: max|delta| vs base = {np.abs(o - base).max():.3e}",
              flush=True)

    # device-trace timing: per-variant xplane parse gives exact device ms
    # (robust to the ~30 ms axon dispatch overhead and host load)
    import glob
    import os

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    def device_ms(trace_dir):
        paths = sorted(
            glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True), key=os.path.getmtime)
        xs = xplane_pb2.XSpace()
        with open(paths[-1], "rb") as fh:
            xs.ParseFromString(fh.read())
        total = 0.0
        for plane in xs.planes:
            if "TPU" not in plane.name and \
                    "/device" not in plane.name.lower():
                continue
            for line in plane.lines:
                lname = line.name.lower()
                if "step" in lname or "module" in lname:
                    continue
                for ev in line.events:
                    total += ev.duration_ps / 1e9
        return total

    for name, f in fns.items():
        d = f"/tmp/attn_trace_{name}"
        os.makedirs(d, exist_ok=True)
        with jax.profiler.trace(d):
            float(jnp.sum(f()[0, 0, :8].astype(jnp.float32)))
        print(f"{name}: {device_ms(d):7.2f} ms device", flush=True)

    # production kernel A/B: baseline vs the v2 fused-bias path
    # ([q·s|rh|rw]@[k|Eh|Ew]ᵀ single full-depth dot + deferred softmax
    # normalization, CLASSPOSE_ATTN_V2)
    from classpose_tpu.nn.attention import flash_attention_relpos_blc

    rel_h = jnp.asarray(
        rng.normal(size=(B, L, n, H)).astype(np.float32) * 0.3,
        jnp.bfloat16)
    rel_w = jnp.asarray(
        rng.normal(size=(B, L, n, W)).astype(np.float32) * 0.3,
        jnp.bfloat16)
    prod = {
        "prod_base": lambda: flash_attention_relpos_blc(
            qkv2, rel_h, rel_w, scale, grid_hw=(H, W), num_heads=n,
            fused_bias=False),
        "prod_v2_fused": lambda: flash_attention_relpos_blc(
            qkv2, rel_h, rel_w, scale, grid_hw=(H, W), num_heads=n,
            fused_bias=True),
    }
    ref = None
    for name, f in prod.items():
        o = np.asarray(f()[0, :4, 0, :4], np.float32)
        if ref is None:
            ref = o
        print(f"{name}: max|delta| vs prod_base = "
              f"{np.abs(o - ref).max():.3e}", flush=True)
        d = f"/tmp/attn_trace_{name}"
        os.makedirs(d, exist_ok=True)
        with jax.profiler.trace(d):
            float(jnp.sum(f()[0, 0, 0, :8].astype(jnp.float32)))
        print(f"{name}: {device_ms(d):7.2f} ms device", flush=True)


if __name__ == "__main__":
    main()
