"""Shared Levenberg-Marquardt machinery (g2o-compatible policies).

The reference delegates all back-end math to g2o's
OptimizationAlgorithmLevenberg (Optimizer.cc:86, 226, 395). The behavioral
contract reproduced here:

  * initial damping  lambda0 = tau * max_i H_ii  with tau = 1e-5;
  * additive damping (H + lambda*I);
  * Nielsen gain-ratio policy: on accept
      lambda *= max(1/3, 1 - (2*rho - 1)^3),  nu = 2
    on reject
      lambda *= nu,  nu *= 2  (and the step is rolled back);
  * Huber robust kernel with delta = sqrt(5.991): IRLS weight
      w(e2) = 1                 if e2 <= delta^2
              delta / sqrt(e2)  otherwise
    (first-order robustification, matching g2o's RobustKernelHuber);
  * edge chi2 used for outlier classification is the RAW squared error
    (g2o edge->chi2()), while the LM accept decision uses the robustified
    total chi2.
"""

from __future__ import annotations

import jax.numpy as jnp

TAU = 1e-5
CHI2_MONO = 5.991
HUBER_DELTA2 = 5.991


def huber_weight(e2, use_huber):
    """IRLS weight for squared error e2 under the Huber kernel."""
    delta = jnp.sqrt(jnp.asarray(HUBER_DELTA2, e2.dtype))
    safe = jnp.maximum(e2, 1e-12)
    w = jnp.where(e2 <= HUBER_DELTA2, 1.0, delta / jnp.sqrt(safe))
    return jnp.where(use_huber, w, jnp.ones_like(e2))


def huber_rho(e2, use_huber):
    """Robustified chi2 contribution rho(e2) (for the LM accept decision)."""
    delta = jnp.sqrt(jnp.asarray(HUBER_DELTA2, e2.dtype))
    safe = jnp.maximum(e2, 1e-12)
    rob = 2.0 * delta * jnp.sqrt(safe) - HUBER_DELTA2
    r = jnp.where(e2 <= HUBER_DELTA2, e2, rob)
    return jnp.where(use_huber, r, e2)


def nielsen_update(lam, nu, rho, accepted):
    """Nielsen lambda schedule (g2o OptimizationAlgorithmLevenberg)."""
    shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
    lam_acc = lam * shrink
    lam_rej = lam * nu
    lam_new = jnp.where(accepted, lam_acc, lam_rej)
    nu_new = jnp.where(accepted, jnp.full_like(nu, 2.0), nu * 2.0)
    return lam_new, nu_new


def projection_jacobians(Xc, fx, fy):
    """d(uv)/d(point-in-camera) for pinhole projection.

    Xc: [..., 3] camera-frame points. Returns [..., 2, 3].
    """
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zs = jnp.where(z == 0, jnp.ones_like(z), z)
    iz = 1.0 / zs
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    row1 = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def se3_point_jacobian(Xc):
    """d(point-in-camera)/d(xi) for left-multiplicative update exp(xi)*T,
    xi = [omega, upsilon]. Returns [..., 3, 6] = [ -[Xc]x | I ].
    """
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r0 = jnp.stack([zero, z, -y, one, zero, zero], axis=-1)
    r1 = jnp.stack([-z, zero, x, zero, one, zero], axis=-1)
    r2 = jnp.stack([y, -x, zero, zero, zero, one], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)
