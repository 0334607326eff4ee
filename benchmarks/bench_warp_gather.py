"""Microbenchmark: candidate gather primitives for the affine-warp resample.

The fused device augmentation's cost is the trilinear affine warp's 8-tap
flat-index gather (PARITY.md: affine-only 383 ms for batch 4 at 96^3x2).
A shear-decomposed warp would replace the per-voxel gather with per-row
dynamic slices (one contiguous row window per (w,h) row) plus elementwise
blends and a shared-slope band matmul.  This measures the primitives at the
msseg2 patch shape so the redesign decision is grounded in numbers:

  flat8        current 8-tap flat jnp.take (whole trilinear sample)
  nearest1     1-tap flat take (label path)
  rowslice     vmapped dynamic_slice: one L-window per (w,h) row
               (the per-pass primitive of a shear decomposition)
  take_d       per-element take_along_axis on the minor axis only
  band_matmul  shared-slope two-band (D,D) resample as a dense matmul
  blend        per-row fractional two-tap elementwise blend

Timing: fori_loop chains forced by a final scalar fetch (CLAUDE.md rig
methodology — repeated dispatches are memoized through the tunnel).
Run: python benchmarks/bench_warp_gather.py   (real chip)
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

W = H = D = 96
C = 2
BATCH = 4
L = 128          # row window length for the shear pass (covers slope <=1.3)
DP = D + L       # padded row length
N_STEPS = 20


def timed(name, chain_fn, *args):
    import os
    only = os.environ.get("ONLY")
    if only and not any(tok in name for tok in only.split(",")):
        return None
    fn = jax.jit(chain_fn)
    float(fn(0, *args))  # compile + warm
    t0 = time.time()
    float(fn(1, *args))
    dt = (time.time() - t0) / N_STEPS
    print(json.dumps({"variant": name, "ms_per_call": round(dt * 1e3, 2)}),
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(BATCH, W, H, D, C)).astype(np.float32))
    volp = jnp.asarray(rng.normal(size=(BATCH, W * H, DP, C)).astype(np.float32))

    from segmentation_pipeline_tpu.ops.augment import (
        random_affine_warp, trilinear_sample, _identity_coords)

    # --- current full affine warp (x trilinear + y nearest) --------------
    def chain_full(seed, v):
        key = jax.random.PRNGKey(seed)

        def body(i, x):
            k = jax.random.fold_in(key, i)
            out, yo = jax.vmap(
                lambda kk, xx: random_affine_warp(kk, xx, xx))(
                    jax.random.split(k, BATCH), x)
            return out + 0.0 * yo
        v = lax.fori_loop(0, N_STEPS, body, v)
        return v.sum()

    # --- image-only trilinear sample at affine coords ---------------------
    coords0 = _identity_coords((W, H, D))

    def warp_coords(k):
        ang = jax.random.uniform(k, (), minval=-0.5, maxval=0.5)
        c, s = jnp.cos(ang), jnp.sin(ang)
        center = (jnp.array([W, H, D], jnp.float32) - 1) / 2
        rel = coords0 - center[:, None, None, None]
        A = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
        A = A.at[0, 0].set(c).at[0, 2].set(s).at[2, 0].set(-s).at[2, 2].set(c)
        return jnp.einsum("ij,jwhd->iwhd", A, rel) + center[:, None, None, None]

    def chain_tri(seed, v, nearest):
        key = jax.random.PRNGKey(seed)

        def body(i, x):
            k = jax.random.fold_in(key, i)
            cs = warp_coords(k)
            out = jax.vmap(lambda xx: trilinear_sample(xx, cs,
                                                       nearest=nearest))(x)
            return out.astype(x.dtype)  # keep the carry dtype stable
        v = lax.fori_loop(0, N_STEPS, body, v)
        return v.sum(dtype=jnp.float32)

    # --- rowslice: per-row L-window dynamic slice (shear-pass primitive) --
    def chain_rowslice(seed, v):
        key = jax.random.PRNGKey(seed)

        def body(i, x):
            k = jax.random.fold_in(key, i)
            starts = jax.random.randint(k, (BATCH, W * H), 0, DP - L)

            def per_sample(rows, st):
                return jax.vmap(
                    lambda row, s: lax.dynamic_slice(row, (s, 0), (L, C))
                )(rows, st)
            sl = jax.vmap(per_sample)(x, starts)      # (B, WH, L, C)
            return x.at[:, :, :L].set(sl)
        v = lax.fori_loop(0, N_STEPS, body, v)
        return v.sum()

    # --- take_d: per-element gather on the minor axis only ----------------
    def chain_take_d(seed, v):
        key = jax.random.PRNGKey(seed)

        def body(i, x):
            k = jax.random.fold_in(key, i)
            idx = jax.random.randint(k, (BATCH, W * H, DP), 0, DP)
            g = jnp.take_along_axis(x, idx[..., None], axis=2)
            return g
        v = lax.fori_loop(0, N_STEPS, body, v)
        return v.sum()

    # --- band matmul: shared-slope d-axis resample -------------------------
    def chain_band(seed, v):
        key = jax.random.PRNGKey(seed)

        def body(i, x):
            k = jax.random.fold_in(key, i)
            slope = 1.0 + 0.2 * jax.random.uniform(k, ())
            pos = slope * jnp.arange(DP, dtype=jnp.float32)
            j0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, DP - 2)
            f = pos - j0
            M = (jax.nn.one_hot(j0, DP, dtype=x.dtype) * (1 - f)[:, None]
                 + jax.nn.one_hot(j0 + 1, DP, dtype=x.dtype) * f[:, None])
            return jnp.einsum("brdc,ed->brec", x, M)
        v = lax.fori_loop(0, N_STEPS, body, v)
        return v.sum()

    # --- blend: per-row fractional two-tap elementwise ---------------------
    def chain_blend(seed, v):
        key = jax.random.PRNGKey(seed)

        def body(i, x):
            k = jax.random.fold_in(key, i)
            f = jax.random.uniform(k, (BATCH, W * H, 1, 1))
            return (1 - f) * x + f * jnp.roll(x, 1, axis=2)
        v = lax.fori_loop(0, N_STEPS, body, v)
        return v.sum()

    # --- batching strategies for the per-sample warp ----------------------
    from segmentation_pipeline_tpu.ops.augment import (
        _affine_coords_oob, draw_affine_matrix)

    def warp_one(k, xx):
        A = draw_affine_matrix(k)
        cs, oob = _affine_coords_oob(A, (W, H, D))
        return jnp.where(oob[..., None], 0.0, trilinear_sample(xx, cs))

    def mk(fn):
        def chain(seed, v):
            key = jax.random.PRNGKey(seed)

            def body(i, x):
                k = jax.random.fold_in(key, i)
                return fn(jax.random.split(k, BATCH), x).astype(x.dtype)
            return lax.fori_loop(0, N_STEPS, body, v).sum(dtype=jnp.float32)
        return chain

    def vmap_warp(keys, x):
        return jax.vmap(warp_one)(keys, x)

    def loop_warp(keys, x):
        return jnp.stack([warp_one(keys[b], x[b]) for b in range(BATCH)])

    def map_warp(keys, x):
        return lax.map(lambda kv: warp_one(kv[0], kv[1]), (keys, x))

    timed("full_affine_warp(x+y)", chain_full, vol)
    timed("trilinear_flat8(x, coords shared across batch)",
          lambda s, v: chain_tri(s, v, False), vol)
    timed("nearest_flat1(y)", lambda s, v: chain_tri(s, v, True), vol)
    timed("persample_vmap(x)", mk(vmap_warp), vol)
    timed("persample_unrolled(x)", mk(loop_warp), vol)
    timed("persample_laxmap(x)", mk(map_warp), vol)
    # dtype levers: the gather is HBM-bound, so a half-width source may pay
    timed("persample_laxmap(x, bf16 source)", mk(map_warp),
          vol.astype(jnp.bfloat16))
    timed("nearest_flat1(y, bf16 source)",
          lambda s, v: chain_tri(s, v, True), vol.astype(jnp.bfloat16))
    timed("nearest_flat1(y, uint8 source)",
          lambda s, v: chain_tri(s, v, True),
          (vol > 0).astype(jnp.uint8))
    timed("rowslice_gather", chain_rowslice, volp)
    timed("take_along_minor", chain_take_d, volp)
    timed("band_matmul", chain_band, volp)
    timed("frac_blend", chain_blend, volp)


if __name__ == "__main__":
    main()

