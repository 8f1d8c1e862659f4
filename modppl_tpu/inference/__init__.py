"""Standard inference library.

Model-agnostic via the GenFn interface (the reference's crucial property,
modppl/src/lib.rs:2-5): every procedure here is generic over any object
implementing simulate/generate/update/regenerate.
"""

from modppl_tpu.inference.importance import (
    importance_resampling,
    importance_sampling,
    tree_index,
)
from modppl_tpu.inference.mh import (
    metropolis_hastings,
    mh,
    regen_mh,
    regenerative_metropolis_hastings,
)
from modppl_tpu.inference.enumerate import auto_supports, enumerate_posterior
from modppl_tpu.inference.fivo import fit_proposal, fivo_objective
from modppl_tpu.inference.kalman import (
    kalman_filter,
    kalman_filter_parallel,
    kalman_smoother,
    kalman_smoother_parallel,
)
from modppl_tpu.inference.hmc import hmc, hmc_runner
from modppl_tpu.inference.nuts import nuts, nuts_runner
from modppl_tpu.inference.chees import chees, chees_runner
from modppl_tpu.inference.mala import mala
from modppl_tpu.inference.vi import advi, advi_fullrank
from modppl_tpu.inference.map_laplace import (
    laplace_approximation,
    map_optimize,
)
from modppl_tpu.inference.pgibbs import csmc_sweep, particle_gibbs
from modppl_tpu.inference.pmcmc import (
    gaussian_walk_proposal,
    pmmh,
    smc_log_ml_fn,
)
from modppl_tpu.inference.checkpointed import (
    checkpointed_hmc_runner,
    checkpointed_particle_filter,
)
from modppl_tpu.inference.smc import ParticleSystem
from modppl_tpu.inference.smc_sampler import smc_sampler
from modppl_tpu.inference.tempering import parallel_tempering

__all__ = [
    "importance_sampling", "importance_resampling", "tree_index",
    "metropolis_hastings", "mh",
    "regenerative_metropolis_hastings", "regen_mh",
    "ParticleSystem",
    "smc_sampler", "parallel_tempering",
    "enumerate_posterior", "auto_supports",
    "fivo_objective", "fit_proposal",
    "kalman_filter", "kalman_filter_parallel",
    "kalman_smoother", "kalman_smoother_parallel",
    "pmmh", "gaussian_walk_proposal", "smc_log_ml_fn",
    "checkpointed_particle_filter", "checkpointed_hmc_runner",
    "mala",
    "hmc", "hmc_runner", "nuts", "nuts_runner",
    "chees", "chees_runner",
    "particle_gibbs", "csmc_sweep",
    "advi", "advi_fullrank",
    "map_optimize", "laplace_approximation",
]
