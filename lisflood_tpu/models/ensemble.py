"""Ensemble simulation: Monte Carlo and Ensemble Kalman Filter.

The reference runs ensembles by forking one OS process per member through
the PCRaster MonteCarloFramework / EnsKalmanFilterFramework
(main.py:98-115, Lisflood_monteCarlo.py, Lisflood_EnKF.py) and pickling
state at filter steps (stateVar.py:37-143). The TPU-native equivalent is
a vmapped ensemble dimension: all members advance in ONE device program
(SURVEY.md §2.6), with state perturbation on device and an EnKF analysis
step on the stacked ensemble state.

The reference's EnKF is semi-stubbed (random placeholder observations,
Lisflood_EnKF.py:42-63); here the analysis is a standard stochastic EnKF:
  K = P H^T (H P H^T + R)^-1 from ensemble anomalies,
  X_a = X_f + K (y + eps - H X_f),
applied to a chosen set of prognostic fields, observing discharge at
gauge pixels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .step import build_step

# prognostic fields updated by the EnKF analysis (positive-clamped after)
DEFAULT_ANALYSIS_FIELDS = ("ChanQKin", "ChanM3Kin", "UZ", "LZ", "W1a", "W1b", "W2")


def perturb_state(key, state, fields, sigma=0.05, min_val=0.0):
    """Multiplicative lognormal-ish perturbation of selected state fields
    (reference perturbState, add1.py:918-945)."""
    out = dict(state)
    keys = jax.random.split(key, len(fields))
    for k, field in zip(keys, fields):
        v = state[field]
        noise = 1.0 + sigma * jax.random.normal(k, v.shape, v.dtype)
        out[field] = jnp.maximum(v * noise, min_val)
    return out


class EnsembleRunner:
    """Vmapped ensemble of model instances sharing parameters/forcing.

    With `with_outputs=True`, each member reports its maps/TSS through its
    own OutputManager into the per-sample directory PathOut/<member>/ —
    the reference MonteCarloFramework layout (main.py:98-115,
    Lisflood_monteCarlo.py:24-44: each sample's DynamicFramework writes
    into its numbered sample directory)."""

    def __init__(self, runner, n_members, seed=0,
                 perturb_fields=("UZ", "LZ", "W1a", "W1b", "W2"), sigma=0.05,
                 with_outputs=False):
        self.runner = runner
        self.n = n_members
        base_state = runner.step_fn.prepare_state(runner.state)
        keys = jax.random.split(jax.random.PRNGKey(seed), n_members)
        members = [perturb_state(k, base_state, perturb_fields, sigma) for k in keys]
        self.state = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *members)
        self.vstep = jax.jit(jax.vmap(runner.step_fn, in_axes=(0, None)))
        self.outputs = self._make_outputs() if with_outputs else None

    def _make_outputs(self):
        import os
        from .driver import OutputManager

        managers = []
        for m in range(self.n):
            s_m = self.runner.settings.for_subdir(str(m + 1))
            os.makedirs(s_m.output_dir, exist_ok=True)
            managers.append(OutputManager(s_m, self.runner.grid,
                                          self.runner.params_np,
                                          self.runner.aux, self.runner.config))
        self._needed = sorted(managers[0].needed_fields()) if managers else []
        return managers

    def advance(self, offset_range):
        """Advance all members over the given step offsets, reporting
        per-member outputs when configured."""
        runner = self.runner
        start = runner.settings.step_start_int
        end = runner.settings.step_end_int
        for offset in offset_range:
            date = runner.dates[offset]
            f = runner.forcing_for(offset, date)
            self.state, diag = self.vstep(self.state, f)
            if self.outputs:
                step = start + offset
                host = {k: np.asarray(diag[k]) for k in self._needed if k in diag}
                for m, man in enumerate(self.outputs):
                    diag_m = {k: v[m] for k, v in host.items()}
                    man.report(step, date, diag_m, is_last=(step == end))
        return self.state, diag

    def close_outputs(self):
        for man in self.outputs or ():
            man.close()

    # ------------------------------------------------------------------
    def enkf_analysis(self, obs_values, obs_pixels, obs_sigma,
                      fields=DEFAULT_ANALYSIS_FIELDS, seed=1):
        """Stochastic EnKF analysis on the stacked ensemble.

        obs_values: (n_obs,) observed discharge [m3/s];
        obs_pixels: (n_obs,) pixel indices of the gauges;
        obs_sigma:  observation error std (scalar or (n_obs,)).
        """
        # The analysis operates on an (n_obs, n_obs) system with n_obs in
        # the tens — the linear algebra runs host-side (the heavy parts,
        # the anomaly products over the state, stay on device).
        N = self.n
        obs_pixels = np.asarray(obs_pixels)
        y = np.asarray(obs_values, np.float64)
        n_obs = y.shape[0]
        r_std = np.broadcast_to(np.asarray(obs_sigma, np.float64), (n_obs,))

        # forecast observations per member: H X_f
        hx = self._gauge_discharge(obs_pixels)                     # (N, n_obs)
        hx_anom = hx - hx.mean(0)
        s = hx_anom.T @ hx_anom / (N - 1) + np.diag(r_std**2)
        s_inv = np.linalg.inv(s)

        rng = np.random.default_rng(seed)
        eps = rng.normal(size=(N, n_obs)) * r_std                  # perturbed obs
        innov = (y[None] + eps - hx) @ s_inv                       # (N, n_obs)

        innov_d = jnp.asarray(innov)
        hx_anom_d = jnp.asarray(hx_anom)
        new_state = dict(self.state)
        # routing fields live under pk$ names when the packed router holds
        # the routing state in schedule order (models/step.uses_packed_state)
        fields = [f if f in self.state else "pk$" + f for f in fields]
        for field in fields:
            xf = self.state[field]                                 # (N, ...) member-major
            flat = xf.reshape(N, -1)
            anom = flat - flat.mean(0)
            gain = anom.T @ hx_anom_d / (N - 1)                    # (dim, n_obs)
            upd = innov_d @ gain.T                                 # (N, dim)
            new_flat = jnp.maximum(flat + upd, 0.0)
            new_state[field] = new_flat.reshape(xf.shape)
        self.state = new_state
        return new_state

    def _gauge_discharge(self, obs_pixels):
        """(N, n_obs) member discharge at natural-space pixel indices,
        regardless of whether ChanQ is held naturally or packed."""
        if "ChanQ" in self.state:
            return np.asarray(self.state["ChanQ"])[:, np.asarray(obs_pixels)]
        inv = np.asarray(self.runner.step_fn.routers["kin"].ps.inv_perm)
        return np.asarray(self.state["pk$ChanQ"])[:, inv[np.asarray(obs_pixels)]]

    # ------------------------------------------------------------------
    def dump_states(self, directory, step):
        """Persist per-member prognostic state (stateVar.py:37-143
        analogue, npz instead of pickles)."""
        import os

        os.makedirs(directory, exist_ok=True)
        host = jax.tree_util.tree_map(np.asarray, self.state)
        for m in range(self.n):
            member = {k: v[m] for k, v in host.items()}
            np.savez(os.path.join(directory, f"stateVar_{m + 1}_{step}.npz"), **member)

    def load_states(self, directory, step):
        import os

        members = []
        for m in range(self.n):
            data = np.load(os.path.join(directory, f"stateVar_{m + 1}_{step}.npz"))
            members.append({k: jnp.asarray(data[k]) for k in data.files})
        self.state = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *members)


def run_from_settings(runner, settings, seed=0):
    """MonteCarlo / EnKF orchestration from the settings file (reference
    main.py:98-115): `EnsMembers` > 1 selects the vmapped ensemble (the
    reference forks a process per sample — setForkSamples, main.py:104-106);
    `FilterSteps` turn the run into an Ensemble Kalman Filter: advance to
    each filter step, dump per-member state (stateVar.dynamic, stateVar.py:
    37-143), run the analysis, resume. The reference's setObservations is a
    random placeholder (Lisflood_EnKF.py:50-63); here the analysis
    assimilates the ensemble-mean outlet discharge with 10% error — a
    deterministic stand-in that exercises the same machinery."""
    import os

    ens = EnsembleRunner(runner, settings.ens_members, seed=seed,
                         with_outputs=True)
    start = settings.step_start_int
    end = settings.step_end_int
    n_steps = end - start + 1
    filter_offsets = sorted(st - start + 1 for st in settings.filter_steps
                            if start <= st <= end)
    state_dir = os.path.join(settings.output_dir, "stateVar")
    obs_pixels = np.flatnonzero(np.asarray(runner.params_np["AtLastPointC"]))

    prev = 0
    for off in filter_offsets:
        ens.advance(range(prev, off))
        step = start + off - 1
        ens.dump_states(state_dir, step)
        if obs_pixels.size:
            hx = ens._gauge_discharge(obs_pixels)
            y = hx.mean(0)
            sigma = np.maximum(0.1 * np.abs(y), 1e-6)
            ens.enkf_analysis(y, obs_pixels, sigma, seed=seed + off)
        prev = off
    if prev < n_steps:
        ens.advance(range(prev, n_steps))
    ens.close_outputs()
    return ens


def run_montecarlo(runner, n_members, seed=0, max_steps=None, with_outputs=False):
    """Monte Carlo run: perturbed ensemble advanced to the end; returns the
    stacked final states (main.py:98-106 analogue, vmapped not forked)."""
    ens = EnsembleRunner(runner, n_members, seed=seed, with_outputs=with_outputs)
    n = runner.settings.step_end_int - runner.settings.step_start_int + 1
    if max_steps is not None:
        n = min(n, max_steps)
    ens.advance(range(n))
    ens.close_outputs()
    return ens
