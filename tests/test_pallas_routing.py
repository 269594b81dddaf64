"""Pallas sub-step-loop kernel gates (ops/kinwave_pallas.py).

The kernel runs interpreted on CPU (Mosaic needs a TPU), so these tests
check the same computation graph the TPU executes, minus Mosaic codegen —
the on-chip equivalence was additionally verified against the sequential
path at the float32 noise floor on the real device (ChanQKin within 1e-5
of the substeps path at continental scale; the bf16-default matmul
precision pitfall is pinned to HIGHEST in the kernel)."""
import dataclasses
import os

import numpy as np
import pytest

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"

pytestmark = pytest.mark.skipif(not os.path.isdir(CASE), reason="test data missing")


@pytest.mark.slow
def test_pallas_substep_loop_equivalent():
    """Full synthetic model, float32: RoutingPipeline=pallas equals the
    sequential sub-step loop bitwise on CPU (interpret mode compiles to
    the same XLA ops)."""
    import jax
    import jax.numpy as jnp
    from lisflood_tpu.models.synthetic import build_synthetic_model, synthetic_forcing
    from lisflood_tpu.models.step import build_step

    states = {}
    for pipe in ("substeps", "pallas"):
        cfg, params, state, aux = build_synthetic_model(
            nrows=24, ncols=20, no_rout_steps=6, chunk_size=64,
            with_structures=False)
        cfg = dataclasses.replace(cfg, routing_pipeline=pipe)
        step, p = build_step(cfg, params, aux, dtype=jnp.float32)
        f32 = lambda v: jnp.asarray(v, jnp.float32 if np.asarray(v).dtype.kind == "f" else None)
        s = step.prepare_state({k: f32(v) for k, v in state.items()})
        f = {k: f32(v) for k, v in synthetic_forcing(cfg.num_pixels).items()}
        out, diag = step(s, f)
        states[pipe] = step.natural_state(out)
    # cancellation-amplified diagnostics: CrossSection2Area is
    # (Chan2M3Kin - Chan2M3Start)/dx with near-equal operands, and
    # Sideflow1Chan lives at ~1e-3 magnitudes — the XLA substeps-vs-
    # chunk-major comparison shows the same two keys elevated at the
    # same level (float32 noise floor measured on the real chip).
    # Default gate 3e-5: the Mosaic kernel eliminates the per-sub-step
    # M3<->Q round-trip pows via the v^3/v^5 identities (kinwave_pallas
    # substep_poly) while the substeps partner keeps the reference
    # round-trips, so the two differ by ~1 ulp per sub-step compounding to
    # a measured 1.02e-5 on ChanQ here; a real divergence (wrong window
    # slot, mis-scattered lane) shows at >=1e-2
    loose = {"CrossSection2Area": 1e-2, "Sideflow1Chan": 1e-2}
    for k in states["substeps"]:
        a = np.asarray(states["substeps"][k])
        b = np.asarray(states["pallas"][k])
        scale = max(np.abs(a).max(), 1e-30)
        tol = loose.get(k, 3e-5)
        assert np.abs(a - b).max() / scale < tol, \
            f"{k}: {np.abs(a - b).max() / scale}"


@pytest.mark.slow
def test_pallas_substep_loop_equivalent_structures():
    """Full synthetic model WITH lakes + reservoirs, float32:
    RoutingPipeline=pallas (structure chains hoisted into the Mosaic
    kernel) equals the sequential sub-step loop, including the per-lake /
    per-reservoir state vectors, across two chained model steps."""
    import jax
    import jax.numpy as jnp
    from lisflood_tpu.models.synthetic import build_synthetic_model, synthetic_forcing
    from lisflood_tpu.models.step import build_step

    states = {}
    for pipe in ("substeps", "pallas"):
        cfg, params, state, aux = build_synthetic_model(
            nrows=24, ncols=20, no_rout_steps=6, chunk_size=64,
            with_structures=True)
        cfg = dataclasses.replace(cfg, routing_pipeline=pipe)
        step, p = build_step(cfg, params, aux, dtype=jnp.float32)
        f32 = lambda v: jnp.asarray(v, jnp.float32 if np.asarray(v).dtype.kind == "f" else None)
        s = step.prepare_state({k: f32(v) for k, v in state.items()})
        f = {k: f32(v) for k, v in synthetic_forcing(cfg.num_pixels).items()}
        s, _ = step(s, f)
        s, _ = step(s, f)       # second step exercises the carried CC state
        states[pipe] = step.natural_state(s)
    # CrossSection2Area = (Chan2M3Kin - Chan2M3Start)/dx subtracts near-equal
    # ~1e4-scale operands down to ~1e-2: its error scale is the OPERAND
    # magnitude (the XLA-only substeps-vs-diagonal comparison of this exact
    # config shows 7.6e-3 relative to the tiny difference itself). Gate it
    # against Chan2M3Kin/dx instead; Sideflow1Chan lives at ~1e-3 magnitudes.
    cross2_scale = float(np.abs(np.asarray(states["substeps"]["Chan2M3Kin"])).max()) / 4000.0
    scales = {"CrossSection2Area": cross2_scale}
    loose = {"Sideflow1Chan": 1e-2}
    checked = 0
    # two-step f32 noise floor: the XLA-only substeps-vs-diagonal comparison
    # of this exact configuration shows 1.6e-5 on ChanQ (measured), and the
    # Mosaic kernel's round-trip-pow elimination (see the non-structures
    # test's gate comment) adds ~1 ulp/sub-step of legitimate divergence —
    # measured 7.1e-5 over the two chained steps here. 1.5e-4 is the
    # tightest gate clear of that floor; real divergences show at >=1e-2
    for k in states["substeps"]:
        a = np.asarray(states["substeps"][k])
        b = np.asarray(states["pallas"][k])
        scale = scales.get(k, max(np.abs(a).max(), 1e-30))
        tol = loose.get(k, 1.5e-4)
        assert np.abs(a - b).max() / scale < tol, \
            f"{k}: {np.abs(a - b).max() / scale}"
        checked += 1
    for k in ("LakeStorageM3CC", "LakeOutflowCC", "ReservoirStorageM3CC",
              "ReservoirFillCC"):
        assert k in states["pallas"], k
    assert checked > 30


def test_pallas_kernel_vs_numpy_oracle():
    """Kernel vs a literal NumPy transcription of the chunk-major sub-step
    algorithm, split routing + cross-block windows exercised."""
    import jax
    import jax.numpy as jnp
    from lisflood_tpu.models.config import ModelConfig
    from lisflood_tpu.ops.kinwave_pallas import build_substep_pallas
    from lisflood_tpu.ops.kinwave_packed import _newton_unrolled

    nC, C, W, T = 16, 128, 2, 3
    beta = 0.6
    rng = np.random.default_rng(1)
    cfg = ModelConfig(no_rout_steps=T, dt_sec=86400.0, num_pixels=nC * C)
    f = lambda lo, hi: rng.uniform(lo, hi, (nC, C)).astype(np.float32)
    dl = np.full((nC, C), W * C, np.int32)
    for c in range(nC - 1):
        for l in range(C):
            if rng.random() < 0.7:
                dw = rng.integers(0, min(W, nC - 1 - c))
                dl[c, l] = dw * C + rng.integers(0, C)
    xs = {"ToChan": jnp.asarray(f(0, 10)), "dx": jnp.asarray(f(4000, 5000)),
          "adx1": jnp.asarray(f(0.5, 5)), "alpha1": jnp.asarray(f(0.5, 5)),
          "ischan": jnp.ones((nC, C), jnp.float32), "dl": jnp.asarray(dl),
          "q1_0": jnp.asarray(f(0, 10)), "m31_0": jnp.asarray(f(0, 1e4)),
          "chanq_0": jnp.asarray(f(0, 10))}

    class PS:
        chunk = C
        n_chunks = nC
        window = W

    run = build_substep_pallas(cfg, PS, beta, {}, interpret=True)
    ys = {k: np.asarray(v) for k, v in run(xs).items()}

    win = np.zeros((T, W * C), np.float32)
    out = {k: np.zeros((nC, C), np.float32) for k in ("q1", "m31", "chanq", "sumdis")}
    x = {k: np.asarray(v) for k, v in xs.items()}
    for c in range(nC):
        q1 = x["q1_0"][c].copy()
        sumdis = np.zeros(C, np.float32)
        Q = np.zeros((T, C), np.float32)
        inv_dx = np.float32(1.0) / x["dx"][c]
        for t in range(T):
            sideflow = x["ToChan"][c] * inv_dx / np.float32(cfg.dt_routing)
            cc = win[t, :C] + x["adx1"][c] * q1 ** np.float32(beta) + sideflow * x["dx"][c]
            q = np.asarray(_newton_unrolled(jnp.asarray(cc), jnp.asarray(x["adx1"][c]), beta),
                           np.float32)
            Q[t] = q
            m31 = np.maximum(x["dx"][c] * x["alpha1"][c] * q ** np.float32(beta), 0).astype(np.float32)
            q1 = ((m31 * inv_dx / x["alpha1"][c]) ** np.float32(1 / beta)).astype(np.float32)
            sumdis += q1
        onehot = (dl[c][:, None] == np.arange(W * C)[None]).astype(np.float32)
        win = np.concatenate([win[:, C:], np.zeros((T, C), np.float32)], 1) + Q @ onehot
        out["q1"][c] = q1
        out["m31"][c] = m31
        out["chanq"][c] = q1
        out["sumdis"][c] = sumdis
    for k in out:
        err = np.abs(ys[k] - out[k]).max() / max(np.abs(out[k]).max(), 1e-30)
        assert err < 1e-6, f"{k}: {err}"
