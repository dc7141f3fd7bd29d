"""Device-side photometric augmentation (runs inside the jitted train step).

With a weak host (the input pipeline budget is ~1 CPU core per chip in most
TPU pods), the host-side photometric ops (augment.py:127-204 — LUTs,
convertScaleAbs, filter2D, noise adds) dominate input-pipeline latency: ~half
of the ~22 ms/sample host cost at 640px. This module moves them on-device,
where they are a rounding error next to the forward pass: the whole color
OneOf collapses into ONE per-image random 3x3 color matrix + bias (every host
color op — brightness/contrast, color-jitter, HSV-ish shift, RGB shift,
channel shuffle — is affine in RGB), applied as a single einsum, plus a noise
/ motion-blur branch. Labels are untouched (photometric only); geometry
(mosaic/affine/flip/letterbox) stays on host where box bookkeeping is natural.

Semantics mirror TrainTransform's OneOf probabilities (augment.py:244-249):
with p_color choose one of 5 color ops; with p_noise choose gaussian noise or
3-tap motion blur. Hue/saturation act in RGB space (luma-preserving rotation
about the gray axis) rather than exact uint8-HSV round-trips — same
distribution family, not bit-identical to the host path.

Determinism: the caller folds the optimizer-step counter into the key, so a
resumed run reproduces the same augmentation stream without any host RNG
threading.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ITU-R BT.601 luma — matches cv2's RGB2GRAY weights.
_LUMA = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)

# the 6 permutations of 3 channels (channel_shuffle's sample space)
_PERMS = jnp.asarray([
    [0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]],
    jnp.int32)


def _saturation_matrix(s):
    """lerp(gray, img, s) as a 3x3 matrix (luma-preserving)."""
    eye = jnp.eye(3, dtype=jnp.float32)
    gray = jnp.tile(_LUMA[None, :], (3, 1))
    return s[..., None, None] * eye + (1.0 - s[..., None, None]) * gray


def _hue_matrix(theta):
    """Rotation about the gray axis (YIQ hue rotate), theta in radians."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    one = jnp.ones_like(c)

    def row(a, b, d):
        return jnp.stack([a * one, b * one, d * one], -1)

    m = jnp.stack([
        row(0.299, 0.587, 0.114) + c[..., None] * row(0.701, -0.587, -0.114)
        + s[..., None] * row(0.168, 0.330, -0.497),
        row(0.299, 0.587, 0.114) + c[..., None] * row(-0.299, 0.413, -0.114)
        + s[..., None] * row(-0.328, 0.035, 0.292),
        row(0.299, 0.587, 0.114) + c[..., None] * row(-0.300, -0.588, 0.886)
        + s[..., None] * row(1.250, -1.050, -0.203),
    ], axis=-2)
    return m


def _color_params(key, batch, p_color):
    """Per-image (M [B,3,3], b [B,3]) for the color OneOf."""
    ks = jax.random.split(key, 10)
    eye = jnp.eye(3, dtype=jnp.float32)

    # branch 0: brightness/contrast (augment.py:127-130)
    alpha = 1.0 + jax.random.uniform(ks[0], (batch,), minval=-0.2, maxval=0.2)
    beta = jax.random.uniform(ks[1], (batch,), minval=-0.2, maxval=0.2) * 255.0
    m_bc = alpha[:, None, None] * eye
    b_bc = jnp.tile(beta[:, None], (1, 3))

    # branch 1: color jitter = brightness/contrast + saturation + hue (:145-150)
    sat = 1.0 + jax.random.uniform(ks[2], (batch,), minval=-0.15, maxval=0.15)
    hue = jax.random.uniform(ks[3], (batch,), minval=-0.05, maxval=0.05) * (
        2.0 * jnp.pi)
    m_cj = jnp.einsum("bij,bjk,bkl->bil", _hue_matrix(hue),
                      _saturation_matrix(sat), m_bc)
    b_cj = b_bc

    # branch 2: HSV-ish shift (:153-158): small hue/sat/val perturbations
    hue2 = jax.random.uniform(ks[4], (batch,), minval=-5.0, maxval=5.0) * (
        jnp.pi / 90.0)
    sat2 = 1.0 + jax.random.uniform(ks[5], (batch,), minval=-0.12, maxval=0.12)
    val2 = jax.random.uniform(ks[6], (batch,), minval=-15.0, maxval=15.0)
    m_hsv = jnp.einsum("bij,bjk->bik", _hue_matrix(hue2),
                       _saturation_matrix(sat2))
    b_hsv = jnp.tile(val2[:, None], (1, 3))

    # branch 3: rgb shift (:161-164)
    b_rgb = jax.random.randint(ks[7], (batch, 3), -20, 21).astype(jnp.float32)
    m_rgb = jnp.tile(eye[None], (batch, 1, 1))

    # branch 4: channel shuffle (:167-171)
    pidx = jax.random.randint(ks[8], (batch,), 0, 6)
    m_sh = jax.nn.one_hot(_PERMS[pidx], 3, dtype=jnp.float32)
    b_sh = jnp.zeros((batch, 3), jnp.float32)

    ms = jnp.stack([m_bc, m_cj, m_hsv, m_rgb, m_sh], 1)    # [B,5,3,3]
    bs = jnp.stack([b_bc, b_cj, b_hsv, b_rgb, b_sh], 1)    # [B,5,3]
    branch = jax.random.randint(ks[9], (batch,), 0, 5)
    onehot = jax.nn.one_hot(branch, 5, dtype=jnp.float32)
    m = jnp.einsum("bk,bkij->bij", onehot, ms)
    b = jnp.einsum("bk,bki->bi", onehot, bs)

    apply = (jax.random.uniform(key, (batch,)) < p_color)[:, None, None]
    m = jnp.where(apply, m, eye[None])
    b = jnp.where(apply[..., 0], b, 0.0)
    return m, b


def photometric_augment(images_u8: jnp.ndarray, key: jax.Array,
                        p_color: float = 0.4,
                        p_noise: float = 0.15) -> jnp.ndarray:
    """[B,H,W,3] uint8 -> uint8, per-image random photometric transform."""
    batch = images_u8.shape[0]
    k_color, k_noise, k_gauss, k_sigma, k_which, k_dir = jax.random.split(
        key, 6)
    x = images_u8.astype(jnp.float32)

    m, b = _color_params(k_color, batch, p_color)
    # per-pixel 3x3: out_c = sum_d M[c,d] * in_d + b_c
    x = jnp.einsum("bhwd,bcd->bhwc", x, m) + b[:, None, None, :]

    # noise OR motion blur with p_noise (augment.py:248-249)
    u = jax.random.uniform(k_noise, (batch,))
    do_noise = u < (p_noise * 0.5)
    do_blur = (u >= p_noise * 0.5) & (u < p_noise)

    sigma = jnp.sqrt(jax.random.uniform(k_sigma, (batch,), minval=5.0,
                                        maxval=20.0))
    noise = jax.random.normal(k_gauss, x.shape, jnp.float32) * \
        sigma[:, None, None, None]
    x = jnp.where(do_noise[:, None, None, None], x + noise, x)

    # 3-tap mean along H or W (host: cv2.filter2D 3x3 line kernel)
    horiz = jax.random.uniform(k_dir, (batch,)) < 0.5
    blur_w = (jnp.roll(x, 1, 2) + x + jnp.roll(x, -1, 2)) / 3.0
    blur_h = (jnp.roll(x, 1, 1) + x + jnp.roll(x, -1, 1)) / 3.0
    blur = jnp.where(horiz[:, None, None, None], blur_w, blur_h)
    x = jnp.where(do_blur[:, None, None, None], blur, x)

    return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)
