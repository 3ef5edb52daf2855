"""In-jit photometric augmentation (device analogue of
datasets/augmentations.py; reference gluefactory/datasets/augmentations.py
'lg' pipeline built on albumentations, which runs per-image on the host CPU).

TPU-first rationale: the round-1 host pipeline moved whole image batches
through the remote-device link every step and was the training bottleneck
(~2 samples/s). Here augmentation is part of the jitted train step: brightness
/ contrast / gamma / additive noise / low-frequency shading / separable blur
are all elementwise or tiny-stencil VPU work fused by XLA, with per-image
parameters drawn from the traced PRNG key. Everything is differentiable and
shape-static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bernoulli_factor(key, b: int, p: float, sampler, neutral):
    """Sample per-image parameters, applied with probability p."""
    k1, k2 = jax.random.split(key)
    apply = jax.random.bernoulli(k1, p, (b,))
    val = sampler(k2)
    return jnp.where(apply.reshape(b, 1, 1, 1), val, neutral)


def _separable_blur(images: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """5-tap Gaussian blur with a per-image sigma (B,) via shifted sums
    (edge padding). Differentiable, no dynamic shapes."""
    offs = jnp.arange(-2, 3, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (offs[None, :] / jnp.maximum(sigma[:, None], 1e-3)) ** 2)
    w = w / jnp.sum(w, axis=1, keepdims=True)  # (B, 5)

    def blur_axis(x, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (2, 2)
        xp = jnp.pad(x, pad, mode="edge")
        n = x.shape[axis]
        out = jnp.zeros_like(x)
        for i in range(5):
            sl = [slice(None)] * 4
            sl[axis] = slice(i, i + n)
            out = out + xp[tuple(sl)] * w[:, i].reshape(-1, 1, 1, 1)
        return out

    return blur_axis(blur_axis(images, 1), 2)


def photometric_augment(
    key: jax.Array,
    images: jnp.ndarray,
    p: float = 0.95,
    strength: float = 1.0,
) -> jnp.ndarray:
    """Randomly jitter a batch of images (B, H, W, C) in [0, 1].

    ``strength`` scales every perturbation amplitude; ``p`` is the per-image
    probability of each individual transform.
    """
    b = images.shape[0]
    s = strength
    keys = jax.random.split(key, 7)
    x = images

    # contrast about the per-image mean
    contrast = _bernoulli_factor(
        keys[0], b, p, lambda k: jax.random.uniform(k, (b, 1, 1, 1), minval=1.0 - 0.4 * s, maxval=1.0 + 0.4 * s), 1.0
    )
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = mean + (x - mean) * contrast

    # brightness shift
    bright = _bernoulli_factor(
        keys[1], b, p, lambda k: jax.random.uniform(k, (b, 1, 1, 1), minval=-0.15 * s, maxval=0.15 * s), 0.0
    )
    x = x + bright

    # gamma (on clipped values)
    gamma = _bernoulli_factor(
        keys[2], b, p, lambda k: jax.random.uniform(k, (b, 1, 1, 1), minval=1.0 - 0.3 * s, maxval=1.0 + 0.3 * s), 1.0
    )
    x = jnp.clip(x, 1e-4, 1.0) ** gamma

    # low-frequency multiplicative shading (≙ RandomAdditiveShade,
    # reference augmentations.py:19)
    k_apply, k_field = jax.random.split(keys[3])
    field = jax.random.uniform(
        k_field, (b, 4, 4, 1), minval=1.0 - 0.5 * s, maxval=1.0
    )
    field = jax.image.resize(field, (b, x.shape[1], x.shape[2], 1), "bilinear")
    apply_shade = jax.random.bernoulli(k_apply, p * 0.6, (b,)).reshape(b, 1, 1, 1)
    x = x * jnp.where(apply_shade, field, 1.0)

    # Gaussian blur with random sigma
    k_apply, k_sig = jax.random.split(keys[4])
    sigma = jax.random.uniform(k_sig, (b,), minval=0.2, maxval=1.3 * s + 0.2)
    blurred = _separable_blur(x, sigma)
    apply_blur = jax.random.bernoulli(k_apply, 0.3 * p, (b,)).reshape(b, 1, 1, 1)
    x = jnp.where(apply_blur, blurred, x)

    # additive Gaussian noise
    k_apply, k_amp, k_noise = jax.random.split(keys[5], 3)
    amp = jax.random.uniform(k_amp, (b, 1, 1, 1), maxval=0.04 * s)
    noise = jax.random.normal(k_noise, x.shape) * amp
    apply_noise = jax.random.bernoulli(k_apply, p, (b,)).reshape(b, 1, 1, 1)
    x = x + jnp.where(apply_noise, noise, 0.0)

    return jnp.clip(x, 0.0, 1.0)
