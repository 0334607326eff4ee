"""Fused, batched, on-device augmentation kernels.

The reference runs all augmentation per-subject on CPU dataloader workers
(SURVEY §3.1 hot loop); here the same family of stochastic transforms
(flip, affine, elastic, bias field, gamma, noise, blur, rescale — the
main_config.py:86-100 / msseg2.py:44-57 pipelines) is expressed as pure jax
functions over channels-last batches (N, W, H, D, C) with explicit PRNG keys.
Composed under one jit, XLA fuses the elementwise chain and the warp gathers
into a single device program — the "transforms fuse into batched
preprocessing" design of BASELINE.json.  Labels ride along with nearest-
neighbor warps so segmentation targets stay crisp.

Parity with the host transforms is distributional (explicit keys vs the
reference's unseeded global RNG).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# sampling helpers
# ---------------------------------------------------------------------------

def trilinear_sample(volume: jnp.ndarray, coords: jnp.ndarray,
                     nearest: bool = False) -> jnp.ndarray:
    """Sample (W, H, D, C) at fractional coords (3, w, h, d) with edge clamp.
    nearest=True for label volumes.

    All 8 corner taps go through ONE flat-index gather (jnp.take on the
    flattened volume) instead of 8 advanced-indexing gathers — measured
    1.7x faster on v5e for 96^3 warps, bit-identical output (TPU gathers
    are the cost of the whole augmentation pipeline; see PARITY.md).

    CLOSED investigation (v5e, 96^3 C=2 f32): pre-pairing neighbor voxels
    into wider gather rows to cut descriptor count — pair-d (2C rows,
    4 taps) 200 ms, pair-hd (4C, 2 taps) 156 ms, pair-whd (8C, 1 tap)
    119 ms vs 136 ms for this kernel; lax.gather with slice_sizes
    (2,2,2,C) 4524 ms. The only winner (pair-whd, ~13%) costs 8x HBM for
    the source volume, which is prohibitive at whole-volume shapes, so
    the flat-index gather stays."""
    W, H, D, C = volume.shape
    flat = volume.reshape(W * H * D, C)
    cw = jnp.clip(coords[0], 0, W - 1)
    ch = jnp.clip(coords[1], 0, H - 1)
    cd = jnp.clip(coords[2], 0, D - 1)

    def base(a, b, c):
        return (a * H + b) * D + c

    if nearest:
        iw = jnp.rint(cw).astype(jnp.int32)
        ih = jnp.rint(ch).astype(jnp.int32)
        id_ = jnp.rint(cd).astype(jnp.int32)
        return jnp.take(flat, base(iw, ih, id_), axis=0)

    w0 = jnp.floor(cw).astype(jnp.int32)
    h0 = jnp.floor(ch).astype(jnp.int32)
    d0 = jnp.floor(cd).astype(jnp.int32)
    w1 = jnp.minimum(w0 + 1, W - 1)
    h1 = jnp.minimum(h0 + 1, H - 1)
    d1 = jnp.minimum(d0 + 1, D - 1)
    fw = (cw - w0)[..., None]
    fh = (ch - h0)[..., None]
    fd = (cd - d0)[..., None]

    idx = jnp.stack([base(w0, h0, d0), base(w1, h0, d0), base(w0, h1, d0),
                     base(w0, h0, d1), base(w1, h1, d0), base(w1, h0, d1),
                     base(w0, h1, d1), base(w1, h1, d1)])
    g = jnp.take(flat, idx, axis=0)  # (8, w, h, d, C): one gather

    out = (g[0] * (1 - fw) * (1 - fh) * (1 - fd)
           + g[1] * fw * (1 - fh) * (1 - fd)
           + g[2] * (1 - fw) * fh * (1 - fd)
           + g[3] * (1 - fw) * (1 - fh) * fd
           + g[4] * fw * fh * (1 - fd)
           + g[5] * fw * (1 - fh) * fd
           + g[6] * (1 - fw) * fh * fd
           + g[7] * fw * fh * fd)
    return out


def _identity_coords(spatial: Tuple[int, int, int]) -> jnp.ndarray:
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in spatial],
                         indexing="ij")
    return jnp.stack(grids)  # (3, W, H, D)


# ---------------------------------------------------------------------------
# per-sample stochastic ops (vmapped over the batch by augment_batch)
# ---------------------------------------------------------------------------

def random_flip(key, x, y, axes=(0, 1, 2), flip_probability=0.5):
    """Independent per-axis flips applied consistently to image and label."""
    draws = jax.random.uniform(key, (3,))
    for axis in axes:
        do = draws[axis] < flip_probability
        x = lax.cond(do, lambda v: jnp.flip(v, axis=axis), lambda v: v, x)
        if y is not None:
            y = lax.cond(do, lambda v: jnp.flip(v, axis=axis), lambda v: v, y)
    return x, y


def draw_affine_matrix(key, scales=0.2, degrees=45.0):
    """Sample the random rotation+scale matrix (tio.RandomAffine semantics:
    scale U(1-s, 1+s), angles U(-d, d) per axis; A = Rx Ry Rz diag(scale))."""
    k1, k2 = jax.random.split(key)
    scale = jax.random.uniform(k1, (3,), minval=1 - scales, maxval=1 + scales)
    angles = jnp.deg2rad(jax.random.uniform(k2, (3,), minval=-degrees,
                                            maxval=degrees))
    cx, cy, cz = jnp.cos(angles)
    sx, sy, sz = jnp.sin(angles)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rx @ Ry @ Rz @ jnp.diag(scale)


def _label_background(y):
    """Fill vector for out-of-bounds label voxels: background class for
    one-hot labels (all-zero vectors would un-supervise those voxels); a
    single-channel label is a binary/int mask whose background is 0."""
    if y.shape[-1] == 1:
        return jnp.zeros((1,), y.dtype)
    return jnp.zeros((y.shape[-1],), y.dtype).at[0].set(1.0)


def random_affine_warp(key, x, y, scales=0.2, degrees=45.0, pad_value=0.0):
    """Random rotation+scale about the volume center — per-sample direct
    trilinear warp.  Shares its coordinate math (_affine_coords_oob) with
    the fused pipeline's batched _affine_stage, so the public per-sample op
    and the fused path cannot drift."""
    A = draw_affine_matrix(key, scales, degrees)
    coords, oob = _affine_coords_oob(A, x.shape[:3])
    # out-of-bounds samples got edge-clamped; mask them to pad_value
    x_out = jnp.where(oob[..., None], pad_value, trilinear_sample(x, coords))
    y_out = None
    if y is not None:
        y_out = trilinear_sample(y, coords, nearest=True)
        y_out = jnp.where(oob[..., None], _label_background(y), y_out)
    return x_out, y_out


def _affine_coords_oob(A, spatial, dtype=jnp.float32):
    """Per-sample analytic warp coords (3, W, H, D) and out-of-bounds mask
    as fused broadcast sums: coord_i = A[i,0] w + A[i,1] h + A[i,2] d + t_i
    about the volume center."""
    W, H, D = spatial
    sp = jnp.array([W, H, D], dtype)
    center = (sp - 1) / 2
    t = center - A @ center
    aw = jnp.arange(W, dtype=dtype)[:, None, None]
    ah = jnp.arange(H, dtype=dtype)[None, :, None]
    ad = jnp.arange(D, dtype=dtype)[None, None, :]
    cs = [A[i, 0] * aw + A[i, 1] * ah + A[i, 2] * ad + t[i] for i in range(3)]
    oob = ((cs[0] < 0) | (cs[0] > W - 1) | (cs[1] < 0) | (cs[1] > H - 1)
           | (cs[2] < 0) | (cs[2] > D - 1))
    return jnp.stack(cs), oob


def _affine_stage(do, A, X, y, pad_value=0.0, batching="map",
                  gather_dtype=None):
    """Batched affine warp stage (direct trilinear gather).

    batching picks how the per-sample warp maps over the batch:
    "map" (default) runs the samples through lax.map, keeping every
    gather UNBATCHED — XLA lowers a vmapped (batched-index) gather ~2.4x
    slower than the same gathers issued per sample on v5e (252 vs ~105 ms
    at batch 4, 96^3x2 f32; benchmarks/bench_warp_gather.py), and the
    warp dominates the fused augmentation, so the map form is the fast
    path ON ONE DEVICE.  "vmap" keeps the classic batched lowering (same
    results) — REQUIRED when the batch axis is sharded over a mesh: a
    lax.map scan over a sharded axis serializes the devices, while the
    per-device sub-batches under vmap are small enough that the batched
    lowering penalty mostly vanishes (the trainer picks per-mesh
    automatically).

    Samples with do=False warp by the identity and are select-restored.

    gather_dtype (config key "warp_gather_dtype"): gather the IMAGE taps
    from a copy of the source cast to this dtype — bfloat16 halves the
    warp's HBM read traffic (the gather is bandwidth-bound; measured ~9%
    off the trilinear warp on v5e, PARITY.md "Source-dtype levers") at the
    cost of rounding each tap to 8 mantissa bits before the f32 blend.
    Labels are unaffected (nearest-neighbor copies ride the uint8-ids fast
    path already). Default None = exact f32 taps.

    CLOSED investigation (see benchmarks/bench_warp_gather.py and
    PARITY.md): a shear-decomposed warp (LDU / 9-shear passes of per-row
    window slices — a Pallas row kernel reached 2.3 ms/pass vs 17.7 ms
    for the XLA row gather) is 5-8x cheaper per pass, but at the
    reference's augmentation domain (scales 0.2, degrees 45,
    ref research/msseg2/msseg2.py:49) the intermediate passes read up to
    +/-175 voxels outside the 96^3 box for voxels whose FINAL coords are
    in-bounds, so correct multi-pass warping needs ~15x larger
    intermediate volumes — infeasible.  Exact per-voxel trilinear it is.
    """
    spatial = X.shape[1:4]
    eye = jnp.eye(3, dtype=A.dtype)
    A_eff = jnp.where(do[:, None, None], A, eye)

    def warp_one(a, xx, yy):
        # coords ALWAYS in f32: sub-f32 image dtypes cannot represent
        # voxel indices above 256 exactly, which would quantize sample
        # positions on large volumes (the blend then runs in the image
        # dtype; the result is cast back so both lax.cond branches agree)
        coords, ob = _affine_coords_oob(a, spatial, jnp.float32)
        src = xx if gather_dtype is None else xx.astype(gather_dtype)
        x_out = jnp.where(ob[..., None], pad_value,
                          trilinear_sample(src, coords)).astype(xx.dtype)
        if yy is None:
            return x_out, None
        y_out = trilinear_sample(yy, coords, nearest=True)
        return x_out, jnp.where(ob[..., None], _label_background(yy), y_out)

    if batching == "map":
        # per-sample lax.cond SKIPS the gather for do=False samples — a
        # TPU conditional executes only the taken branch, so at affine_p
        # the warp (the pipeline's dominant cost) runs for only ~p of the
        # batch. vmap can't do this (batched cond lowers to select: both
        # branches execute), which is one more reason map is the
        # single-device fast path. Results are bit-identical: the taken
        # branch computes exactly warp_one(A), the skip branch returns
        # the input exactly (vs. the select path's identity-matrix warp,
        # whose integer coords also reproduce the input).
        if y is None:
            Xw = lax.map(
                lambda dav: lax.cond(
                    dav[0],
                    lambda av: warp_one(av[0], av[1], None)[0],
                    lambda av: av[1], (dav[1], dav[2])),
                (do, A, X))
            return Xw, None
        Xw, yw = lax.map(
            lambda dav: lax.cond(
                dav[0],
                lambda av: warp_one(*av),
                lambda av: (av[1], av[2]), (dav[1], dav[2], dav[3])),
            (do, A, X, y))
        return Xw, yw
    else:
        if y is None:
            Xw = jax.vmap(lambda a, xx: warp_one(a, xx, None)[0])(A_eff, X)
            yw = None
        else:
            Xw, yw = jax.vmap(warp_one)(A_eff, X, y)

    sel = do[:, None, None, None, None]
    X = jnp.where(sel, Xw, X)
    if y is not None:
        y = jnp.where(sel, yw, y)
    return X, y


def random_elastic_warp(key, x, y, num_control_points=(7, 7, 7),
                        max_displacement=7.5, locked_borders=1):
    """B-spline-style free-form deformation: coarse random control grid
    upsampled (cubic via repeated linear for TPU-friendliness) to a dense
    displacement field (tio.RandomElasticDeformation semantics)."""
    spatial = x.shape[:3]
    grid = jax.random.uniform(key, (3, *num_control_points),
                              minval=-max_displacement, maxval=max_displacement)
    if locked_borders:
        lb = locked_borders
        mask = jnp.zeros(num_control_points, bool)
        mask = mask.at[lb:-lb, lb:-lb, lb:-lb].set(True)
        grid = grid * mask[None]

    # upsample control grid to a dense field with jax.image cubic resize
    # (keys/kernel differ from the host path's exact B-spline — the device
    # augmentation contract is distributional)
    field = jax.image.resize(grid, (3, *spatial), method="cubic")
    coords = _identity_coords(spatial) + field

    x_out = trilinear_sample(x, coords)
    y_out = trilinear_sample(y, coords, nearest=True) if y is not None else None
    return x_out, y_out


def random_bias_field(key, x, coefficients=0.5, order=3):
    """Multiplicative exp-polynomial bias field (tio.RandomBiasField)."""
    spatial = x.shape[:3]
    n_coeff = sum(1 for i in range(order + 1) for j in range(order + 1 - i)
                  for k in range(order + 1 - i - j))
    coeffs = jax.random.uniform(key, (n_coeff,), minval=-coefficients,
                                maxval=coefficients)
    xs = jnp.linspace(-1, 1, spatial[0])[:, None, None]
    ys = jnp.linspace(-1, 1, spatial[1])[None, :, None]
    zs = jnp.linspace(-1, 1, spatial[2])[None, None, :]
    field = jnp.zeros(spatial, jnp.float32)
    idx = 0
    for i in range(order + 1):
        for j in range(order + 1 - i):
            for k in range(order + 1 - i - j):
                field = field + coeffs[idx] * (xs ** i) * (ys ** j) * (zs ** k)
                idx += 1
    return x * jnp.exp(field)[..., None]


def random_gamma(key, x, log_gamma=(-0.3, 0.3)):
    gamma = jnp.exp(jax.random.uniform(key, (), minval=log_gamma[0],
                                       maxval=log_gamma[1]))
    return jnp.sign(x) * jnp.abs(x) ** gamma


def random_noise(key, x, std=0.1):
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(k1, (), minval=0.0, maxval=std)
    return x + sigma * jax.random.normal(k2, x.shape, x.dtype)


def rescale_intensity(x, out_min=-1.0, out_max=1.0,
                      percentiles=(0.0, 100.0)):
    # percentiles are the hot-path cost: each jnp.percentile call sorts the
    # full volume, and TPU sorts are slow. One fused call (single sort)
    # for real percentiles; min/max (no sort at all) for (0, 100).
    p_lo, p_hi = percentiles
    if p_lo <= 0.0 and p_hi >= 100.0:
        lo, hi = x.min(), x.max()
    else:
        lo, hi = jnp.percentile(x, jnp.asarray(percentiles, jnp.float32))
    x = jnp.clip(x, lo, hi)
    scale = jnp.where(hi - lo > 1e-12, (out_max - out_min) / (hi - lo), 0.0)
    return (x - lo) * scale + out_min


# ---------------------------------------------------------------------------
# fused pipeline
# ---------------------------------------------------------------------------

DEFAULT_CONFIG = dict(
    flip_axes=(0, 1, 2),
    affine_p=0.6, affine_scales=0.2, affine_degrees=45.0,
    affine_batching="map",
    elastic_p=0.0, elastic_max_displacement=7.5,
    bias_p=0.5, bias_coefficients=0.5,
    gamma_p=0.8, log_gamma=(-0.3, 0.3),
    noise_p=0.35, noise_std=0.1,
    rescale=(-1.0, 1.0), rescale_percentiles=(0.5, 99.5),
    # "bfloat16" gathers the affine warp's image taps from a bf16 copy of
    # the source (~9% off the HBM-bound warp, PARITY.md "Source-dtype
    # levers") at 8-mantissa-bit tap precision; None = exact f32
    warp_gather_dtype=None,
)


def _augment_pre(keys, x, y, cfg: Dict):
    """Per-sample stage before the (batched) affine warp: flips."""
    return random_flip(keys[0], x, y, axes=cfg["flip_axes"])


def _augment_post(keys, x, y, cfg: Dict):
    """Per-sample stage after the affine warp: elastic, bias, gamma, noise,
    rescale — key indices match the original 11-way split so per-op random
    streams are unchanged by the staging.

    Every probability gate is a lax.cond: under the per-sample lax.map
    batching a TPU conditional executes ONLY the taken branch, so a skipped
    op costs nothing (the elastic warp especially); under vmap (sharded
    batch axes) the batched cond lowers to the same select the old
    jnp.where gates compiled to — outputs are identical either way."""
    if cfg["elastic_p"] > 0:
        do = jax.random.uniform(keys[3]) < cfg["elastic_p"]
        md = cfg["elastic_max_displacement"]
        if y is None:
            x = lax.cond(
                do,
                lambda xx: random_elastic_warp(keys[4], xx, None,
                                               max_displacement=md)[0],
                lambda xx: xx, x)
        else:
            x, y = lax.cond(
                do,
                lambda xy: random_elastic_warp(keys[4], xy[0], xy[1],
                                               max_displacement=md),
                lambda xy: xy, (x, y))

    if cfg["bias_p"] > 0:
        do = jax.random.uniform(keys[5]) < cfg["bias_p"]
        x = lax.cond(
            do,
            lambda xx: random_bias_field(keys[6], xx,
                                         cfg["bias_coefficients"]),
            lambda xx: xx, x)

    x = rescale_intensity(x, 0.0, 1.0, (0.01, 99.9))
    if cfg["gamma_p"] > 0:
        do = jax.random.uniform(keys[7]) < cfg["gamma_p"]
        x = lax.cond(
            do, lambda xx: random_gamma(keys[8], xx, cfg["log_gamma"]),
            lambda xx: xx, x)
    x = rescale_intensity(x, -1.0, 1.0)

    if cfg["noise_p"] > 0:
        do = jax.random.uniform(keys[9]) < cfg["noise_p"]
        x = lax.cond(
            do, lambda xx: random_noise(keys[10], xx, cfg["noise_std"]),
            lambda xx: xx, x)

    x = rescale_intensity(x, *cfg["rescale"], cfg["rescale_percentiles"])
    return x, y


@partial(jax.jit, static_argnames=("config_items",))
def _augment_batch_jit(key, X, y, config_items):
    cfg = dict(config_items)
    # the pipeline COMPUTES in float32 and returns the input image dtype:
    # warp coordinates must never be bf16 (integers above 256 are not
    # representable, which would quantize sample positions on large
    # volumes), and the lax.cond probability gates require both branches
    # to agree on dtype (bias/gamma/noise promote to f32 internally).
    # bf16-cached inputs pay one cast each way — noise next to the warp.
    in_dtype = X.dtype
    if in_dtype != jnp.float32:
        X = X.astype(jnp.float32)
    # integer class-id labels (N, W, H, D) ride through the pipeline as a
    # single uint8 channel: nearest-neighbor warping commutes with one-hot
    # encoding (each output voxel copies ONE source voxel), so warping ids
    # is bit-identical to argmaxing a warped one-hot — and the label gather
    # reads C_label x 4 fewer bytes (uint8 1-tap gathers measured 13 vs
    # 20 ms for 2ch f32 at batch 4 x 96^3 on v5e; PARITY.md dtype rows)
    ids_in = y is not None and y.ndim == 4
    if ids_in:
        y = y[..., None]
    sample_keys = jax.random.split(key, X.shape[0])
    keys = jax.vmap(lambda k: jax.random.split(k, 11))(sample_keys)

    # the pre/post stages batch the same way as the affine warp: lax.map
    # per sample on one device (so the lax.cond probability gates inside
    # actually SKIP skipped ops), vmap when the batch axis is sharded
    batching = cfg.get("affine_batching", "map")

    def per_sample(fn, *args):
        if batching == "map":
            return lax.map(lambda a: fn(*a), args)
        return jax.vmap(fn)(*args)

    if y is None:
        X = per_sample(lambda k, x: _augment_pre(k, x, None, cfg)[0],
                       keys, X)
    else:
        X, y = per_sample(lambda k, x, t: _augment_pre(k, x, t, cfg),
                          keys, X, y)

    if cfg["affine_p"] > 0:
        do = jax.vmap(lambda k: jax.random.uniform(k[1]))(keys) \
            < cfg["affine_p"]
        A = jax.vmap(lambda k: draw_affine_matrix(
            k[2], cfg["affine_scales"], cfg["affine_degrees"]))(keys)
        gd = cfg.get("warp_gather_dtype")
        if gd not in (None, "float32", "f32", "bfloat16", "bf16"):
            raise ValueError(
                f"warp_gather_dtype={gd!r} not supported: use 'bfloat16' "
                f"('bf16') or None/'float32' — a silently ignored value "
                f"would misattribute benchmark results")
        X, y = _affine_stage(
            do, A, X, y, batching=batching,
            gather_dtype=jnp.bfloat16 if gd in ("bfloat16", "bf16") else None)

    if y is None:
        X = per_sample(lambda k, x: _augment_post(k, x, None, cfg)[0],
                       keys, X)
        return X.astype(in_dtype), None
    X, y = per_sample(lambda k, x, t: _augment_post(k, x, t, cfg),
                      keys, X, y)
    if ids_in:
        y = y[..., 0]
    return X.astype(in_dtype), y


def augment_batch(key, X: jnp.ndarray, y: Optional[jnp.ndarray] = None,
                  config: Optional[Dict] = None):
    """One fused device program augmenting a channels-last batch.

    X: (N, W, H, D, C) float; y: optional (N, W, H, D, C_label) one-hot /
    int-channel labels, or (N, W, H, D) integer class ids — all warped
    nearest-neighbor.  Ids are the fast path (smallest gather traffic) and
    bit-identical to argmaxing the warped one-hot.  Returns (X', y') with
    y' in the input's form.
    """
    cfg = dict(DEFAULT_CONFIG)
    if config:
        cfg.update(config)
    items = tuple(sorted((k, tuple(v) if isinstance(v, (list, tuple)) else v)
                         for k, v in cfg.items()))
    return _augment_batch_jit(key, X, y, items)
