"""Fused, batched, on-device augmentation kernels.

The reference runs all augmentation per-subject on CPU dataloader workers
(SURVEY §3.1 hot loop); here the same family of stochastic transforms
(permute, flip, affine, elastic, bias field, gamma, blur, noise, rescale —
the main_config.py:86-100 / msseg2.py:44-57 pipelines) is expressed as pure
jax functions over channels-last batches (N, W, H, D, C) with explicit PRNG
keys.  Composed under one jit, XLA fuses the elementwise chain and the warp
gathers into a single device program — the "transforms fuse into batched
preprocessing" design of BASELINE.json.  Labels ride along with nearest-
neighbor warps so segmentation targets stay crisp.

Every stochastic transform in the two reference training configs has a
device stage here; ``training/auto_augment.py`` derives the stage config
from a declared host pipeline (``device_augmentation="auto"``), and
``DMRI_REFERENCE_CONFIG`` / ``MSSEG2_REFERENCE_CONFIG`` are the reference-
strength configs those declarations derive to.

Parity with the host transforms is distributional (explicit keys vs the
reference's unseeded global RNG); tests/test_device_aug_parity.py holds the
per-op output distributions to the host implementations.
"""
from __future__ import annotations

from functools import partial
from itertools import permutations
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


# scalar shorthand -> (lo, hi): scales=0.2 means U(0.8, 1.2), degrees=45
# means U(-45, 45).  The HOST transforms own this convention — one
# definition keeps host/device parameter parity by construction.
from ..transforms.random_spatial import _as_range


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


_SPATIAL_PERMS = tuple(permutations((0, 1, 2)))  # identity first


def random_permute(key_do, key_pick, x, y, p=1.0):
    """Uniformly permute the spatial axes (device counterpart of
    RandomPermuteDimensions, ref permute_dimensions.py:46 — the host
    rng.shuffle is uniform over all 6 permutations including identity).
    Requires a cubic spatial shape (static shapes under jit)."""
    if x.shape[0] != x.shape[1] or x.shape[1] != x.shape[2]:
        raise ValueError(
            f"random_permute needs cubic spatial dims under jit, got "
            f"{x.shape[:3]} — permute non-cubic volumes in the host pipeline")
    do = jax.random.uniform(key_do) < p
    idx = jax.random.randint(key_pick, (), 0, len(_SPATIAL_PERMS))

    def permute(v):
        branches = [partial(jnp.transpose, axes=(*perm, 3))
                    for perm in _SPATIAL_PERMS]
        return lax.switch(idx, branches, v)

    x = lax.cond(do, permute, lambda v: v, x)
    if y is not None:
        y = lax.cond(do, permute, lambda v: v, y)
    return x, y


def draw_affine_matrix(key, scales=0.2, degrees=45.0):
    """Sample the random rotation+scale matrix (tio.RandomAffine semantics:
    scale U(1-s, 1+s), angles U(-d, d) per axis; A = Rx Ry Rz diag(scale)).
    ``scales``/``degrees`` accept (lo, hi) ranges like the host RandomAffine."""
    k1, k2 = jax.random.split(key)
    s_lo, s_hi = _as_range(scales, center=1.0)
    d_lo, d_hi = _as_range(degrees)
    scale = jax.random.uniform(k1, (3,), minval=s_lo, maxval=s_hi)
    angles = jnp.deg2rad(jax.random.uniform(k2, (3,), minval=d_lo,
                                            maxval=d_hi))
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


def _affine_pad_vector(xx, pad_value):
    """Out-of-bounds fill per channel. A float pads with that constant; the
    string modes mirror tio default_pad_value: 'minimum' / 'mean', and
    'otsu' — tio pads with the mean intensity below the Otsu threshold
    (~the background mean); on device the threshold is approximated by the
    channel mean (documented divergence: brain/background histograms are
    strongly bimodal, so mean-thresholded background means track Otsu's)."""
    if not isinstance(pad_value, str):
        return pad_value
    flat = xx.reshape(-1, xx.shape[-1]).astype(jnp.float32)
    if pad_value == "minimum":
        return flat.min(axis=0).astype(xx.dtype)
    if pad_value == "mean":
        return flat.mean(axis=0).astype(xx.dtype)
    if pad_value == "otsu":
        m = flat.mean(axis=0)
        mask = flat < m[None, :]
        cnt = jnp.maximum(mask.sum(axis=0), 1)
        return ((flat * mask).sum(axis=0) / cnt).astype(xx.dtype)
    raise ValueError(f"Unsupported affine pad mode {pad_value!r}: use a "
                     f"float or 'minimum'/'mean'/'otsu'")


def random_affine_warp(key, x, y, scales=0.2, degrees=45.0, pad_value=0.0):
    """Random rotation+scale about the volume center — per-sample direct
    trilinear warp.  Shares its coordinate math (_affine_coords_oob) with
    the fused pipeline's batched _affine_stage, so the public per-sample op
    and the fused path cannot drift."""
    A = draw_affine_matrix(key, scales, degrees)
    coords, oob = _affine_coords_oob(A, x.shape[:3])
    # out-of-bounds samples got edge-clamped; mask them to pad_value
    pv = _affine_pad_vector(x, pad_value)
    x_out = jnp.where(oob[..., None], pv, trilinear_sample(x, coords))
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

    pad_value: float constant, or 'minimum'/'mean'/'otsu' for per-sample
    per-channel background fills (tio default_pad_value semantics —
    msseg2.py:49 trains with 'otsu').

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
        pv = _affine_pad_vector(xx, pad_value)
        x_out = jnp.where(ob[..., None], pv,
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


from functools import lru_cache


@lru_cache(maxsize=64)
def _bspline_basis(n_cp: int, size: int):
    """(size, n_cp) cubic-B-spline interpolation matrix — the SAME operator
    the host elastic transform contracts with (transforms/random_spatial.py
    ElasticDeformation._bspline_matrix), computed with scipy at trace time
    (shapes are static under jit) and embedded as a constant."""
    import numpy as _np
    from scipy import ndimage as _ndi

    pos = _np.linspace(0, n_cp - 1, size, dtype=_np.float64)[None]
    eye = _np.eye(n_cp, dtype=_np.float64)
    cols = [_ndi.map_coordinates(eye[j], pos, order=3, mode="nearest")
            for j in range(n_cp)]
    return _np.stack(cols, axis=1).astype(_np.float32)


def elastic_dense_field(grid, spatial):
    """Upsample a (3, cw, ch, cd) control grid to a (3, W, H, D) dense field
    by separable cubic-B-spline contraction — bit-equal (up to fp
    association) to the host ElasticDeformation.dense_field, so the device
    and host elastic warps share their field construction exactly."""
    cp = grid.shape[1:]
    Ms = [jnp.asarray(_bspline_basis(c, s)) for c, s in zip(cp, spatial)]
    out = jnp.einsum("aijk,wi->awjk", grid, Ms[0])
    out = jnp.einsum("awjk,hj->awhk", out, Ms[1])
    out = jnp.einsum("awhk,dk->awhd", out, Ms[2])
    return out


def random_elastic_warp(key, x, y, num_control_points=(7, 7, 7),
                        max_displacement=7.5, locked_borders=1):
    """B-spline free-form deformation: coarse random control grid upsampled
    to a dense displacement field with the exact separable cubic-B-spline
    operator the host transform uses (tio.RandomElasticDeformation
    semantics, main_config.py:90-91 / msseg2.py:48; field parity asserted in
    tests/test_device_aug_parity.py).  ``max_displacement`` is in voxels,
    scalar or per-axis (the auto-derivation converts the host transforms'
    mm via the dataset spacing)."""
    spatial = x.shape[:3]
    md = jnp.asarray(max_displacement, jnp.float32).reshape(-1)
    if md.shape[0] == 1:
        md = jnp.broadcast_to(md, (3,))
    grid = jax.random.uniform(key, (3, *num_control_points),
                              minval=-1.0, maxval=1.0)
    grid = grid * md[:, None, None, None]
    if locked_borders:
        lb = locked_borders
        mask = jnp.zeros(num_control_points, bool)
        mask = mask.at[lb:-lb, lb:-lb, lb:-lb].set(True)
        grid = grid * mask[None]

    field = elastic_dense_field(grid, spatial)
    coords = _identity_coords(spatial) + field

    x_out = trilinear_sample(x, coords)
    y_out = trilinear_sample(y, coords, nearest=True) if y is not None else None
    return x_out, y_out


def random_bias_field(key, x, coefficients=0.5, order=3):
    """Multiplicative exp-polynomial bias field (tio.RandomBiasField).
    ``coefficients`` is a scalar c for U(-c, c) or an explicit (lo, hi)."""
    spatial = x.shape[:3]
    c_lo, c_hi = _as_range(coefficients)
    n_coeff = sum(1 for i in range(order + 1) for j in range(order + 1 - i)
                  for k in range(order + 1 - i - j))
    coeffs = jax.random.uniform(key, (n_coeff,), minval=c_lo, maxval=c_hi)
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
    """Additive Gaussian noise; scalar std samples sigma U(0, std), a
    (lo, hi) tuple samples U(lo, hi) (tio.RandomNoise / host RandomNoise)."""
    k1, k2 = jax.random.split(key)
    s_lo, s_hi = (0.0, float(std)) if not isinstance(std, (tuple, list)) \
        else (float(std[0]), float(std[1]))
    sigma = jax.random.uniform(k1, (), minval=s_lo, maxval=s_hi)
    return x + sigma * jax.random.normal(k2, x.shape, x.dtype)


def gaussian_blur(x, sigmas_vox, radius: int):
    """Separable 3-axis Gaussian blur of (W, H, D, C) with per-axis,
    per-channel sigma (3, C) in voxels.  Matches
    scipy.ndimage.gaussian_filter semantics (truncate=4.0, mode='reflect'):
    per-channel kernel support floor(4*sigma + 0.5) within the static
    ``radius`` taps, symmetric (edge-repeating) boundary.  sigma=0 is the
    identity.  VPU-only: 2*radius+1 shifted fused multiply-adds per axis."""
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    for axis in range(3):
        sig = jnp.maximum(sigmas_vox[axis], 1e-6)  # (C,)
        support = jnp.floor(4.0 * sigmas_vox[axis] + 0.5)  # scipy radius
        w = jnp.exp(-0.5 * (offs[:, None] / sig[None, :]) ** 2)
        w = jnp.where(jnp.abs(offs)[:, None] <= support[None, :], w, 0.0)
        w = w / w.sum(axis=0, keepdims=True)  # (taps, C)
        w = w.astype(x.dtype)
        pad = [(0, 0)] * 4
        pad[axis] = (radius, radius)
        xp = jnp.pad(x, pad, mode="symmetric")  # scipy 'reflect'
        S = x.shape[axis]
        acc = None
        for t in range(2 * radius + 1):
            sl = [slice(None)] * 4
            sl[axis] = slice(t, t + S)
            term = w[t] * xp[tuple(sl)]
            acc = term if acc is None else acc + term
        x = acc
    return x


def random_blur(key, x, std=(0.0, 1.0), spacing=(1.0, 1.0, 1.0)):
    """Gaussian blur with per-axis std (mm) sampled U(std) — the device
    counterpart of tio.RandomBlur (main_config.py:87, msseg2.py:56).  The
    host transform draws one (3,) std per IMAGE; post-concatenation each
    channel is one image, so the device draws (3, C).  ``spacing`` converts
    mm to voxels (host RandomBlur divides by image.spacing)."""
    s_lo, s_hi = _as_range(std) if isinstance(std, (tuple, list)) \
        else (0.0, float(std))
    C = x.shape[-1]
    std_mm = jax.random.uniform(key, (3, C), minval=s_lo, maxval=s_hi)
    sp = jnp.asarray(spacing, jnp.float32)[:, None]
    radius = max(1, int(4.0 * s_hi / float(min(spacing)) + 0.5))
    return gaussian_blur(x, std_mm / sp, radius)


def rescale_intensity(x, out_min=-1.0, out_max=1.0,
                      percentiles=(0.0, 100.0), per_channel=True):
    """Percentile-clamped linear rescale (tio.RescaleIntensity).

    per_channel=True computes the cutoffs per channel: the host pipelines
    apply RescaleIntensity per IMAGE before ConcatenateImages
    (main_config.py:153,161), so each post-concat channel must be rescaled
    against its own percentiles — a joint rescale would let one modality's
    range distort another's.  percentiles are the hot-path cost: each
    percentile pair is one fused sort per channel; (0, 100) uses min/max
    (no sort at all)."""
    p_lo, p_hi = percentiles
    C = x.shape[-1]
    if per_channel and C > 1:
        flat = x.reshape(-1, C)
        if p_lo <= 0.0 and p_hi >= 100.0:
            lo, hi = flat.min(axis=0), flat.max(axis=0)
        else:
            q = jnp.percentile(flat, jnp.asarray(percentiles, jnp.float32),
                               axis=0)
            lo, hi = q[0], q[1]
    else:
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
    # stage order mirrors the reference training pipelines: permute -> flip
    # -> affine/elastic -> bias -> mid rescale -> gamma -> pre-noise rescale
    # -> blur/noise -> final (model-io) rescale
    permute_p=0.0,
    flip_axes=(0, 1, 2), flip_p=0.5,
    # "independent": affine and elastic gate independently (affine_p /
    # elastic_p). "oneof": tio.OneOf({elastic, affine}, p=oneof_p) semantics
    # (msseg2.py:47-50) — with prob oneof_p apply exactly one of them,
    # picking affine with prob oneof_affine_weight.
    spatial_mode="independent",
    oneof_p=0.75, oneof_affine_weight=0.8,
    affine_p=0.6, affine_scales=0.2, affine_degrees=45.0,
    affine_batching="map", affine_pad=0.0,
    elastic_p=0.0, elastic_max_displacement=7.5,
    elastic_cp=(7, 7, 7), elastic_locked_borders=1,
    bias_p=0.5, bias_coefficients=0.5, bias_order=3,
    mid_rescale=(0.0, 1.0), mid_rescale_percentiles=(0.01, 99.9),
    gamma_p=0.8, log_gamma=(-0.3, 0.3),
    pre_noise_rescale=(-1.0, 1.0),
    blur_p=0.0, blur_std=(0.0, 1.0), blur_spacing=(1.0, 1.0, 1.0),
    # "blur_noise" | "noise_blur" | "random" — the dmri config's
    # OneOf([Compose([blur, noise]), Compose([noise, blur])])
    # (main_config.py:96-99) is "random"; msseg2 (blur then noise,
    # msseg2.py:56-57) is "blur_noise"
    blur_noise_order="blur_noise",
    noise_p=0.35, noise_std=0.1,
    rescale=(-1.0, 1.0), rescale_percentiles=(0.5, 99.5),
    # "bfloat16" gathers the affine warp's image taps from a bf16 copy of
    # the source (~9% off the HBM-bound warp, PARITY.md "Source-dtype
    # levers") at 8-mantissa-bit tap precision; None = exact f32
    warp_gather_dtype=None,
)

# Reference-strength configs: what training/auto_augment.py derives from the
# two research configs' declared pipelines (up to blur_spacing /
# elastic_max_displacement voxel conversion, which depend on the dataset).
# dmri: ref research/dmri_hippo/configs/main_config.py:86-100.
DMRI_REFERENCE_CONFIG = dict(
    flip_axes=(0, 1, 2), flip_p=0.5,
    affine_p=0.0,
    elastic_p=0.5, elastic_cp=(7, 7, 4), elastic_locked_borders=1,
    elastic_max_displacement=(7.5, 7.5, 7.5),
    bias_p=0.5, bias_coefficients=(-0.5, 0.5),
    mid_rescale=(0.0, 1.0), mid_rescale_percentiles=(0.01, 99.9),
    gamma_p=0.8, log_gamma=(-0.3, 0.3),
    pre_noise_rescale=(-1.0, 1.0),
    blur_p=0.2, blur_std=(0.0, 1.0), blur_noise_order="random",
    noise_p=0.3, noise_std=0.035,
    rescale=(-1.0, 1.0), rescale_percentiles=(0.5, 99.5),
)
# msseg2: ref research/msseg2/msseg2.py:44-57 (+ model-io rescale :61).
MSSEG2_REFERENCE_CONFIG = dict(
    permute_p=1.0,
    flip_axes=(0, 1, 2), flip_p=0.5,
    spatial_mode="oneof", oneof_p=0.75, oneof_affine_weight=0.8,
    affine_scales=(0.8, 1.2), affine_degrees=(-45.0, 45.0), affine_pad="otsu",
    elastic_cp=(7, 7, 7), elastic_locked_borders=2,
    elastic_max_displacement=(7.5, 7.5, 7.5),
    bias_p=0.5, bias_coefficients=(-0.5, 0.5),
    mid_rescale=(0.0, 1.0), mid_rescale_percentiles=(0.01, 99.9),
    gamma_p=0.8, log_gamma=(-0.3, 0.3),
    pre_noise_rescale=(-1.0, 1.0),
    blur_p=0.2, blur_std=(0.0, 1.0), blur_noise_order="blur_noise",
    noise_p=0.35, noise_std=0.1,
    rescale=(-1.0, 1.0), rescale_percentiles=(0.05, 99.5),
)

# per-sample PRNG key slots (indices are stable so adding stages never
# re-seeds existing ops)
_N_KEYS = 16
_K_FLIP, _K_AFFINE_GATE, _K_AFFINE, _K_ELASTIC_GATE, _K_ELASTIC = 0, 1, 2, 3, 4
_K_BIAS_GATE, _K_BIAS, _K_GAMMA_GATE, _K_GAMMA = 5, 6, 7, 8
_K_NOISE_GATE, _K_NOISE = 9, 10
_K_BLUR_GATE, _K_BLUR, _K_ORDER, _K_PERM_GATE, _K_PERM = 11, 12, 13, 14, 15


def _augment_pre(keys, x, y, cfg: Dict):
    """Per-sample stage before the (batched) affine warp: permute + flips."""
    if cfg["permute_p"] > 0:
        x, y = random_permute(keys[_K_PERM_GATE], keys[_K_PERM], x, y,
                              p=cfg["permute_p"])
    return random_flip(keys[_K_FLIP], x, y, axes=cfg["flip_axes"],
                       flip_probability=cfg["flip_p"])


def _augment_post(keys, x, y, do_elastic, cfg: Dict):
    """Per-sample stage after the affine warp: elastic, bias, mid rescale,
    gamma, pre-noise rescale, blur/noise (ordered per config), final
    rescale.  ``do_elastic`` is the per-sample gate computed up front (it
    participates in the spatial OneOf with the affine gate).

    Every probability gate is a lax.cond: under the per-sample lax.map
    batching a TPU conditional executes ONLY the taken branch, so a skipped
    op costs nothing (the elastic warp especially); under vmap (sharded
    batch axes) the batched cond lowers to the same select the old
    jnp.where gates compiled to — outputs are identical either way."""
    if cfg["_elastic_possible"]:
        md = cfg["elastic_max_displacement"]
        cp = cfg["elastic_cp"]
        lb = cfg["elastic_locked_borders"]
        if y is None:
            x = lax.cond(
                do_elastic,
                lambda xx: random_elastic_warp(keys[_K_ELASTIC], xx, None,
                                               num_control_points=cp,
                                               max_displacement=md,
                                               locked_borders=lb)[0],
                lambda xx: xx, x)
        else:
            x, y = lax.cond(
                do_elastic,
                lambda xy: random_elastic_warp(keys[_K_ELASTIC], xy[0], xy[1],
                                               num_control_points=cp,
                                               max_displacement=md,
                                               locked_borders=lb),
                lambda xy: xy, (x, y))

    if cfg["bias_p"] > 0:
        do = jax.random.uniform(keys[_K_BIAS_GATE]) < cfg["bias_p"]
        x = lax.cond(
            do,
            lambda xx: random_bias_field(keys[_K_BIAS], xx,
                                         cfg["bias_coefficients"],
                                         order=cfg["bias_order"]),
            lambda xx: xx, x)

    if cfg["mid_rescale"] is not None:
        x = rescale_intensity(x, *cfg["mid_rescale"],
                              cfg["mid_rescale_percentiles"])
    if cfg["gamma_p"] > 0:
        do = jax.random.uniform(keys[_K_GAMMA_GATE]) < cfg["gamma_p"]
        x = lax.cond(
            do, lambda xx: random_gamma(keys[_K_GAMMA], xx, cfg["log_gamma"]),
            lambda xx: xx, x)
    if cfg["pre_noise_rescale"] is not None:
        x = rescale_intensity(x, *cfg["pre_noise_rescale"])

    def apply_noise(xx):
        if cfg["noise_p"] <= 0:
            return xx
        do = jax.random.uniform(keys[_K_NOISE_GATE]) < cfg["noise_p"]
        return lax.cond(
            do, lambda v: random_noise(keys[_K_NOISE], v, cfg["noise_std"]),
            lambda v: v, xx)

    def apply_blur(xx):
        if cfg["blur_p"] <= 0:
            return xx
        do = jax.random.uniform(keys[_K_BLUR_GATE]) < cfg["blur_p"]
        return lax.cond(
            do, lambda v: random_blur(keys[_K_BLUR], v, cfg["blur_std"],
                                      cfg["blur_spacing"]),
            lambda v: v, xx)

    order = cfg["blur_noise_order"]
    if cfg["blur_p"] <= 0:
        x = apply_noise(x)
    elif order == "blur_noise":
        x = apply_noise(apply_blur(x))
    elif order == "noise_blur":
        x = apply_blur(apply_noise(x))
    else:  # "random": the dmri OneOf over the two orders, equal weights
        blur_first = jax.random.uniform(keys[_K_ORDER]) < 0.5
        x = lax.cond(blur_first,
                     lambda v: apply_noise(apply_blur(v)),
                     lambda v: apply_blur(apply_noise(v)), x)

    if cfg["rescale"] is not None:
        x = rescale_intensity(x, *cfg["rescale"], cfg["rescale_percentiles"])
    return x, y


def _spatial_gates(keys, cfg):
    """Per-sample (do_affine, do_elastic) + static possibility flags.
    In "oneof" mode the affine-gate key doubles as the OneOf apply gate and
    the elastic-gate key as the branch pick, so "independent" runs keep
    their original random streams."""
    u_aff = jax.vmap(lambda k: jax.random.uniform(k[_K_AFFINE_GATE]))(keys)
    u_ela = jax.vmap(lambda k: jax.random.uniform(k[_K_ELASTIC_GATE]))(keys)
    if cfg["spatial_mode"] == "oneof":
        applied = u_aff < cfg["oneof_p"]
        w_aff = cfg["oneof_affine_weight"]
        pick_affine = u_ela < w_aff
        do_affine = applied & pick_affine
        do_elastic = applied & ~pick_affine
        affine_possible = cfg["oneof_p"] > 0 and w_aff > 0
        elastic_possible = cfg["oneof_p"] > 0 and w_aff < 1
    else:
        do_affine = u_aff < cfg["affine_p"]
        do_elastic = u_ela < cfg["elastic_p"]
        affine_possible = cfg["affine_p"] > 0
        elastic_possible = cfg["elastic_p"] > 0
    return do_affine, do_elastic, affine_possible, elastic_possible


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
    keys = jax.vmap(lambda k: jax.random.split(k, _N_KEYS))(sample_keys)

    do_affine, do_elastic, affine_possible, elastic_possible = \
        _spatial_gates(keys, cfg)
    cfg["_elastic_possible"] = elastic_possible

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

    if affine_possible:
        A = jax.vmap(lambda k: draw_affine_matrix(
            k[_K_AFFINE], cfg["affine_scales"], cfg["affine_degrees"]))(keys)
        gd = cfg.get("warp_gather_dtype")
        if gd not in (None, "float32", "f32", "bfloat16", "bf16"):
            raise ValueError(
                f"warp_gather_dtype={gd!r} not supported: use 'bfloat16' "
                f"('bf16') or None/'float32' — a silently ignored value "
                f"would misattribute benchmark results")
        X, y = _affine_stage(
            do_affine, A, X, y, pad_value=cfg["affine_pad"],
            batching=batching,
            gather_dtype=jnp.bfloat16 if gd in ("bfloat16", "bf16") else None)

    if y is None:
        X = per_sample(
            lambda k, x, de: _augment_post(k, x, None, de, cfg)[0],
            keys, X, do_elastic)
        return X.astype(in_dtype), None
    X, y = per_sample(lambda k, x, t, de: _augment_post(k, x, t, de, cfg),
                      keys, X, y, do_elastic)
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
    y' in the input's form.  ``config`` overrides DEFAULT_CONFIG;
    training/auto_augment.py derives it from a declared host pipeline.
    """
    cfg = dict(DEFAULT_CONFIG)
    if config:
        unknown = set(config) - set(DEFAULT_CONFIG)
        if unknown:
            raise ValueError(
                f"Unknown augment_batch config keys {sorted(unknown)} — "
                f"a typo here would silently weaken the augmentation")
        cfg.update(config)
    if cfg["spatial_mode"] not in ("independent", "oneof"):
        raise ValueError(f"spatial_mode={cfg['spatial_mode']!r}: use "
                         f"'independent' or 'oneof'")
    if cfg["blur_noise_order"] not in ("blur_noise", "noise_blur", "random"):
        raise ValueError(f"blur_noise_order={cfg['blur_noise_order']!r}: use "
                         f"'blur_noise', 'noise_blur' or 'random'")
    if cfg["permute_p"] > 0 and not (X.shape[1] == X.shape[2] == X.shape[3]):
        raise ValueError(
            f"permute_p > 0 needs cubic spatial dims under jit, got "
            f"{X.shape[1:4]} — permute non-cubic volumes in the host "
            f"pipeline (device patch augmentation is the cubic case)")
    items = tuple(sorted((k, tuple(v) if isinstance(v, (list, tuple)) else v)
                         for k, v in cfg.items()))
    return _augment_batch_jit(key, X, y, items)
