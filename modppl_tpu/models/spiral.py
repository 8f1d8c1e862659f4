"""Spiral-tracking Unfold kernel for SMC.

Reference parity: modppl/tests/dyngenfns/unfold.rs — a polar-coordinate
random-walk kernel with a t==0 initialization branch (t is a *Python* int,
so the branch is static per step) and an mvnormal observation.
"""

import jax.numpy as jnp

from modppl_tpu.dists import mvnormal, normal, uniform
from modppl_tpu.modeling import gen
from modppl_tpu.modeling.unfold import Unfold

OBS_COV = jnp.array([[0.001, 0.0], [0.0, 0.001]])


def polar_to_cartesian(pol):
    """(unfold.rs:11-13)"""
    return jnp.stack([pol[0] * jnp.cos(pol[1]), pol[0] * jnp.sin(pol[1])])


@gen
def spiral_kernel(h, t, prev_pol):
    """(unfold.rs:15-33)"""
    if t == 0:
        r = h.sample(uniform, (0.0, 1.0), "r")
        theta = h.sample(uniform, (0.0, 2.0 * jnp.pi), "theta")
        pol = jnp.stack([r, theta])
    else:
        dr = h.sample(normal, (0.0, 0.1), "dr")
        dtheta = h.sample(normal, (0.4, 0.2), "dtheta")
        pol = jnp.stack([prev_pol[0] + dr, prev_pol[1] + dtheta])
    pos = polar_to_cartesian(pol)
    h.sample(mvnormal, (pos, OBS_COV), "obs")
    return pol


spiral_model = Unfold(spiral_kernel)


# ---- compiled-tier form: the t==0 branch split into (init, step) -----------
# (ScanKernel counterpart of the same kernel, for the vectorized filter.)

@gen
def spiral_init(h, _state0):
    """t == 0 arm of spiral_kernel (unfold.rs:18-23)."""
    r = h.sample(uniform, (0.0, 1.0), "r")
    theta = h.sample(uniform, (0.0, 2.0 * jnp.pi), "theta")
    pol = jnp.stack([r, theta])
    h.sample(mvnormal, (polar_to_cartesian(pol), OBS_COV), "obs")
    return pol


@gen
def spiral_step(h, t, prev_pol):
    """t >= 1 arm of spiral_kernel (unfold.rs:24-28); t may be traced."""
    dr = h.sample(normal, (0.0, 0.1), "dr")
    dtheta = h.sample(normal, (0.4, 0.2), "dtheta")
    pol = jnp.stack([prev_pol[0] + dr, prev_pol[1] + dtheta])
    h.sample(mvnormal, (polar_to_cartesian(pol), OBS_COV), "obs")
    return pol


def spiral_scan_kernel():
    from modppl_tpu.inference.vsmc import ScanKernel
    return ScanKernel(spiral_init, spiral_step)


# ---- batched-particle execution ---------------------------------------------
# The batched tier needs no hand-written model variant: pass
# ``auto_batch=True`` to inference/vsmc.batched_particle_filter (or wrap with
# modeling/autobatch.auto_batch_scan_kernel) and the per-particle kernel
# above runs with plate-per-address sampling automatically.
