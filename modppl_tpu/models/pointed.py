"""Hand-coded GFI model with tuple-buffer Data.

Reference parity: modppl/tests/pointed_model/ — proves the GenFn interface
works without tries: ``Data = (latent | None, obs | None)``, a plain tuple
pytree. The inference library runs it unchanged (the reference's crucial
architectural property, lib.rs:2-5).

Model: latent ~ Uniform2D(bounds); obs ~ MvNormal(latent, obs_cov).
"""

import jax

from modppl_tpu.core.gfi import ArgDiff, GenFn, Trace
from modppl_tpu.dists import mvnormal
from modppl_tpu.models.simple import uniform_2d


class PointedModel(GenFn):
    """(pointed_model/model.rs:14-107)"""

    def __init__(self, obs_cov):
        self.obs_cov = obs_cov

    def simulate(self, key, bounds):
        k1, k2 = jax.random.split(key)
        latent = uniform_2d.sample(k1, bounds)
        logjp = uniform_2d.logpdf(latent, bounds)
        obs = mvnormal.sample(k2, (latent, self.obs_cov))
        logjp = logjp + mvnormal.logpdf(obs, (latent, self.obs_cov))
        return Trace(bounds, (latent, obs), obs, logjp)

    def generate(self, key, bounds, constraints):
        # (model.rs:33-76): manual per-site constrained/unconstrained branches.
        k1, k2 = jax.random.split(key)
        logjp = 0.0
        weight = 0.0

        latent_constraint, obs_constraint = constraints
        if latent_constraint is not None:
            latent = latent_constraint
            w = uniform_2d.logpdf(latent, bounds)
            weight = weight + w
            logjp = logjp + w
        else:
            latent = uniform_2d.sample(k1, bounds)
            logjp = logjp + uniform_2d.logpdf(latent, bounds)

        if obs_constraint is not None:
            obs = obs_constraint
            w = mvnormal.logpdf(obs, (latent, self.obs_cov))
            weight = weight + w
            logjp = logjp + w
        else:
            obs = mvnormal.sample(k2, (latent, self.obs_cov))
            logjp = logjp + mvnormal.logpdf(obs, (latent, self.obs_cov))

        return Trace(bounds, (latent, obs), obs, logjp), weight

    def update(self, key, trace, args, argdiff, constraints):
        # (model.rs:78-105): NoChange only.
        if argdiff is not ArgDiff.NO_CHANGE:
            raise ValueError(f"PointedModel.update: can't handle ArgDiff {argdiff}")
        prev_latent, prev_obs = trace.data
        bounds = trace.args
        discard = [None, None]
        new_logjp = trace.logjp
        visited_obs = False

        latent = prev_latent
        if constraints[0] is not None:
            discard[0] = prev_latent
            latent = constraints[0]
            new_logjp = new_logjp - uniform_2d.logpdf(prev_latent, bounds)
            new_logjp = new_logjp + uniform_2d.logpdf(latent, bounds)
            visited_obs = True
            new_logjp = new_logjp - mvnormal.logpdf(prev_obs, (prev_latent, self.obs_cov))

        obs = prev_obs
        if constraints[1] is not None:
            discard[1] = prev_obs
            obs = constraints[1]
            if not visited_obs:
                new_logjp = new_logjp - mvnormal.logpdf(prev_obs, (prev_latent, self.obs_cov))
            new_logjp = new_logjp + mvnormal.logpdf(obs, (latent, self.obs_cov))
        elif visited_obs:
            new_logjp = new_logjp + mvnormal.logpdf(obs, (latent, self.obs_cov))

        new_trace = Trace(args, (latent, obs), obs, new_logjp)
        return new_trace, tuple(discard), new_logjp - trace.logjp


class DriftProposal(GenFn):
    """Gaussian drift proposal with tuple-buffer Data (pointed_model/proposal.rs:15-56).

    Args: (prev_trace,) following the first-arg-trace proposal convention.
    """

    def __init__(self, drift_cov):
        self.drift_cov = drift_cov

    def simulate(self, key, args):
        prev_trace = args[0]
        prev_latent = prev_trace.data[0]
        new_latent = mvnormal.sample(key, (prev_latent, self.drift_cov))
        logp = mvnormal.logpdf(new_latent, (prev_latent, self.drift_cov))
        return Trace(args, (new_latent, prev_trace.data[1]), None, logp)

    def generate(self, key, args, constraints):
        prev_trace = args[0]
        prev_latent = prev_trace.data[0]
        weight = 0.0
        if constraints[0] is not None:
            new_latent = constraints[0]
            logp = mvnormal.logpdf(new_latent, (prev_latent, self.drift_cov))
            weight = logp
        else:
            new_latent = mvnormal.sample(key, (prev_latent, self.drift_cov))
            logp = mvnormal.logpdf(new_latent, (prev_latent, self.drift_cov))
        return Trace(args, (new_latent, prev_trace.data[1]), None, logp), weight
