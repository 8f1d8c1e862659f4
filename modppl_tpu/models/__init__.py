"""Example model families mirroring the reference test models.

- simple:       Bayesian linear regression + DSL pointed model
                (modppl/tests/dyngenfns/simple.rs)
- hierarchical: bernoulli-gated linear/quadratic regression + proposals
                (modppl/tests/dyngenfns/hierarchical.rs)
- spiral:       spiral-tracking Unfold kernel (modppl/tests/dyngenfns/unfold.rs)
- pointed:      hand-coded GFI model with tuple-buffer Data
                (modppl/tests/pointed_model/)
- hmm:          hand-coded sequential GenFn + exact forward algorithm
                (modppl/tests/hmm/)
- stochvol:     stochastic-volatility state-space family (batched-particle
                form; extension beyond the reference)
- lgssm:        linear-Gaussian state-space family with the exact Kalman
                oracle, incl. the time-parallel associative-scan forms
                (extension beyond the reference)
"""

from modppl_tpu.models.simple import line_model, obs_model, pointed_2d_model, \
    pointed_2d_drift_proposal, Bounds, uniform_2d
from modppl_tpu.models.hierarchical import (
    hierarchical_model,
    hierarchical_drift_proposal,
    add_or_remove_param_proposal,
    read_coeffs,
)
from modppl_tpu.models.spiral import spiral_kernel, spiral_model
from modppl_tpu.models.pointed import PointedModel, DriftProposal
from modppl_tpu.models.hmm import (HMM, HMMParams, hmm_forward_alg,
    hmm_forward_log_ml, hmm_forward_log_ml_parallel)
from modppl_tpu.models.stochvol import SVParams, simulate_sv, sv_scan_kernel
from modppl_tpu.models.lgssm import (
    LGSSMParams,
    lgssm_scan_kernel,
    lgssm_simulate,
    make_lgssm,
)

__all__ = [
    "line_model", "obs_model", "pointed_2d_model", "pointed_2d_drift_proposal",
    "Bounds", "uniform_2d",
    "hierarchical_model", "hierarchical_drift_proposal",
    "add_or_remove_param_proposal", "read_coeffs",
    "spiral_kernel", "spiral_model",
    "PointedModel", "DriftProposal",
    "HMM", "HMMParams", "hmm_forward_alg",
    "hmm_forward_log_ml", "hmm_forward_log_ml_parallel",
    "SVParams", "simulate_sv", "sv_scan_kernel",
    "LGSSMParams", "make_lgssm", "lgssm_scan_kernel", "lgssm_simulate",
]
