"""Inference observability: convergence diagnostics and metrics logging.

SURVEY.md §5: the reference exposes only ESS / log-ML / accept flags as
byproducts (particle_filter.rs:98-100,119-121; mh.rs:36-39). Here these are
first-class, plus what production MCMC needs: split-chain R-hat,
autocorrelation-based effective sample size, divergence counts, and a
JSONL metrics logger for long runs.
"""

import json
import time

import jax.numpy as jnp
import numpy as np


def split_rhat(samples):
    """Split-chain potential scale reduction (Gelman-Rubin, split version).

    samples: array (chains, draws) or (chains, draws, ...) — computed per
    trailing component. Values near 1.0 indicate convergence.
    """
    x = np.asarray(samples)
    c, n = x.shape[0], x.shape[1]
    half = n // 2
    halves = np.concatenate([x[:, :half], x[:, half:2 * half]], axis=0)
    m, n2 = halves.shape[0], halves.shape[1]
    chain_means = halves.mean(axis=1)
    chain_vars = halves.var(axis=1, ddof=1)
    w = chain_vars.mean(axis=0)
    b = n2 * chain_means.var(axis=0, ddof=1)
    var_plus = (n2 - 1) / n2 * w + b / n2
    return np.sqrt(var_plus / np.where(w > 0, w, 1.0))


def ess_autocorr(samples):
    """Effective sample size via Geyer's initial monotone sequence.

    samples: (chains, draws[, ...]); returns scalar (or per-component) ESS
    pooled over chains.
    """
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    c, n = x.shape[0], x.shape[1]
    x = x - x.mean(axis=1, keepdims=True)
    # FFT autocovariance per chain
    fsize = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, fsize, axis=1)
    acov = np.fft.irfft(f * np.conj(f), fsize, axis=1)[:, :n].real / n
    rho = acov.mean(axis=0) / acov[:, 0].mean()
    # Geyer: sum consecutive pairs while positive and monotone
    tau = 1.0
    prev = np.inf
    for k in range(1, n - 2, 2):
        pair = rho[k] + rho[k + 1]
        if pair < 0:
            break
        pair = min(pair, prev)
        prev = pair
        tau += 2.0 * pair
    return c * n / tau


def summarize_mcmc(out, param_names=None):
    """Summary dict for an hmc()/nuts()/mcmc output.

    out: dict with 'samples' {addr: (chains, draws, ...)} and diagnostics.
    """
    summary = {}
    samples = out["samples"]
    for addr, arr in samples.items():
        if param_names is not None and addr not in param_names:
            continue
        a = np.asarray(arr)
        flat = a.reshape(a.shape[0], a.shape[1], -1)
        for d in range(flat.shape[-1]):
            name = addr if flat.shape[-1] == 1 else f"{addr}[{d}]"
            comp = flat[..., d]
            summary[name] = {
                "mean": float(comp.mean()),
                "std": float(comp.std()),
                "r_hat": float(split_rhat(comp)),
                "ess": float(ess_autocorr(comp)),
            }
    if "accept_prob" in out:
        summary["__accept_rate__"] = float(jnp.mean(out["accept_prob"]))
    if "divergences" in out:
        summary["__num_divergent__"] = int(jnp.sum(out["divergences"]))
    if "step_size" in out:
        summary["__step_size__"] = np.asarray(out["step_size"]).mean().item()
    return summary


def summarize_smc(out):
    """Summary dict for a particle_filter() output."""
    return {
        "log_ml": float(out["log_ml"]),
        "min_ess": float(jnp.min(out["ess"])),
        "mean_ess": float(jnp.mean(out["ess"])),
        "num_resampled": int(jnp.sum(out["resampled"])),
        "final_log_weight_spread": float(
            jnp.max(out["log_weights"]) - jnp.min(out["log_weights"])),
    }


class MetricsLogger:
    """Append-only JSONL metrics sink for long inference runs."""

    def __init__(self, path):
        self.path = path
        self._f = open(path, "a")

    def log(self, step, **metrics):
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
