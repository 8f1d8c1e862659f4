"""Visualization of inference results.

Parity with the reference's visualization layer (reference
visualization/visualizer.py:8-177, L8 in SURVEY.md): renders
importance.png / mh.png / hierarchical.png / smc.gif — but consumes the
in-memory outputs of this framework's inference engines directly (or the
same JSON dumps the reference tests wrote) instead of 25k per-iteration
JSON files.

Run the demo end-to-end:  python visualization/visualizer.py
(outputs land next to this file).
"""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.animation as animation
import matplotlib.pyplot as plt
import numpy as np

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def plot_importance_sampling(prior_latents, resampled_latents, obs=(0.0, 0.0),
                             out="importance.png"):
    """Prior vs importance-resampled latents (visualizer.py:8-35)."""
    fig, ax = plt.subplots()
    ax.set_title("Importance Sampling on Uniform2D with MvNormal Likelihood")
    ax.set_xticks([])
    ax.set_yticks([])
    p = np.asarray(prior_latents)
    r = np.asarray(resampled_latents)
    ax.scatter(p[:, 0], p[:, 1], c="blue", alpha=0.1, s=1, label="Prior Samples")
    ax.scatter(r[:, 0], r[:, 1], c="g", alpha=0.5, s=10, label="Importance Samples")
    ax.scatter(obs[0], obs[1], facecolors="none", edgecolors="r", s=200, label="Obs")
    ax.legend()
    fig.savefig(os.path.join(OUT_DIR, out))
    plt.close(fig)


def plot_metropolis_hastings(latent_path, obs=(0.0, 0.0), out="mh.png"):
    """MH chain path over the latent space (visualizer.py:37-59)."""
    fig, ax = plt.subplots()
    ax.set_title("Metropolis-Hastings on Uniform2D with MvNormal Likelihood")
    ax.set_xticks([])
    ax.set_yticks([])
    path = np.asarray(latent_path)
    ax.scatter(path[0, 0], path[0, 1], c="blue", alpha=1, s=200, label="Init Latent")
    ax.plot(path[:, 0], path[:, 1], c="green", alpha=0.5, ls="dotted", label="MH Path")
    ax.scatter(obs[0], obs[1], facecolors="none", edgecolors="r", s=200, label="Obs")
    ax.legend()
    fig.savefig(os.path.join(OUT_DIR, out))
    plt.close(fig)


def plot_hierarchical_model(xs, ys, all_coeffs, out="hierarchical.png"):
    """Posterior regression curves, colored by model dimension
    (visualizer.py:61-77)."""
    fig, ax = plt.subplots()
    ax.set_title("Hierarchical model (custom MCMC proposal)")
    xs = np.asarray(xs)
    ax.scatter(xs, np.asarray(ys))
    for coeffs in all_coeffs:
        c = "pink" if len(coeffs) == 2 else "blue"
        curve = sum(float(ci) * xs ** i for i, ci in enumerate(coeffs))
        ax.plot(xs, curve, c=c, alpha=0.1)
    fig.savefig(os.path.join(OUT_DIR, out))
    plt.close(fig)


def plot_smc(observations, states_before, states_after, out="smc.gif"):
    """Animated particle cloud per SMC step (visualizer.py:79-177).

    observations: (T, 2); states_*: lists of (N, 2) cartesian positions.
    """
    fig, ax = plt.subplots()
    obs = np.asarray(observations)
    frames = []
    for t in range(len(states_before)):
        for tag, states in (("pre-resample", states_before[t]),
                            ("post-resample", states_after[t])):
            s = np.asarray(states)
            art1 = ax.scatter(s[:, 0], s[:, 1], c="green", alpha=0.2, s=4)
            art2 = ax.scatter(obs[: t + 1, 0], obs[: t + 1, 1],
                              facecolors="none", edgecolors="r", s=60)
            art3 = ax.text(0.02, 0.95, f"t={t} ({tag})",
                           transform=ax.transAxes)
            frames.append([art1, art2, art3])
    ani = animation.ArtistAnimation(fig, frames, interval=200, blit=True)
    ani.save(os.path.join(OUT_DIR, out), writer="pillow")
    plt.close(fig)


def _demo():
    """Regenerate the reference gallery from this framework's engines."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(OUT_DIR))
    from modppl_tpu import Trie
    from modppl_tpu.inference import importance_resampling, mh, tree_index
    from modppl_tpu.inference.vsmc import particle_filter
    from modppl_tpu.models import pointed_2d_model, pointed_2d_drift_proposal, \
        Bounds, hierarchical_model, add_or_remove_param_proposal, \
        hierarchical_drift_proposal, read_coeffs
    from modppl_tpu.models.spiral import polar_to_cartesian, spiral_scan_kernel

    bounds = Bounds(-5.0, 5.0, -5.0, 5.0)
    cov = jnp.array([[1.0, -0.6], [-0.6, 2.0]])
    obs_trie = Trie.from_dict({"obs": jnp.zeros(2)})

    # importance sampling gallery (tests/importance.rs workload)
    traces, idx, _ = importance_resampling(
        jax.random.PRNGKey(0), pointed_2d_model, (bounds, cov), obs_trie,
        4000, 400)
    prior = np.asarray(traces.data.read("latent"))
    resampled = prior[np.asarray(idx)]
    plot_importance_sampling(prior, resampled)

    # MH gallery (tests/mh.rs workload, shortened)
    trace, _ = pointed_2d_model.generate(
        jax.random.PRNGKey(1), (bounds, cov), obs_trie)
    key = jax.random.PRNGKey(2)
    path = []
    for _ in range(400):
        key, k = jax.random.split(key)
        trace, _ = mh(k, pointed_2d_model, trace, pointed_2d_drift_proposal,
                      (jnp.array([[0.25, 0.0], [0.0, 0.25]]),))
        path.append(np.asarray(trace.data.read("latent")))
    plot_metropolis_hastings(np.stack(path))

    # hierarchical gallery (tests/mh.rs:76-110 workload, shortened)
    xs = [-5.0, -4.0, -3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    yvals = [0.3 + 0.4 * x + 0.5 * x * x for x in xs]
    hobs = Trie()
    for i, y in enumerate(yvals):
        hobs.observe(f"(y, {i})", y)
    trace, _ = hierarchical_model.generate(jax.random.PRNGKey(3), (xs,), hobs)
    key = jax.random.PRNGKey(4)
    all_coeffs = []
    for _ in range(25):
        key, k1, k2 = jax.random.split(key, 3)
        trace, _ = mh(k1, hierarchical_model, trace, add_or_remove_param_proposal)
        all_coeffs.append([float(c) for c in read_coeffs(trace)])
        trace, _ = mh(k2, hierarchical_model, trace,
                      hierarchical_drift_proposal, (0.05,))
        all_coeffs.append([float(c) for c in read_coeffs(trace)])
    plot_hierarchical_model(xs, yvals, all_coeffs)

    # SMC gallery (tests/smc.rs workload on the compiled filter)
    T, N = 16, 400
    obs = np.stack([[0.4 * np.cos(2 * np.pi * t / T),
                     0.4 * np.sin(2 * np.pi * t / T)] for t in range(T)])
    kernel = spiral_scan_kernel()
    init_c = Trie.from_dict({"obs": jnp.asarray(obs[0])})
    step_c = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x),
        *[Trie.from_dict({"obs": jnp.asarray(o)}) for o in obs[1:]])
    out = particle_filter(jax.random.PRNGKey(5), kernel, jnp.zeros(2),
                          init_c, step_c, N)
    # reconstruct per-step clouds from stored step traces + ancestors
    states_before, states_after = [], []
    polar0 = np.stack([np.asarray(out["init_traces"].data.read("r")),
                       np.asarray(out["init_traces"].data.read("theta"))], -1)
    cart = np.stack([np.asarray(jax.vmap(polar_to_cartesian)(jnp.asarray(polar0)))])[0]
    states_before.append(cart)
    states_after.append(cart[np.asarray(out["ancestors"][0])])
    retv = np.asarray(out["step_traces"].retv)  # (T-1, N, 2) polar
    for t in range(T - 1):
        cart = np.asarray(jax.vmap(polar_to_cartesian)(jnp.asarray(retv[t])))
        states_before.append(cart)
        parents = np.asarray(out["ancestors"][t]) if t + 1 < T - 1 else \
            np.arange(N)
        states_after.append(cart[parents])
    plot_smc(obs, states_before, states_after)
    print("wrote importance.png, mh.png, hierarchical.png, smc.gif to",
          OUT_DIR)


if __name__ == "__main__":
    _demo()
