"""Golden regression gates: every routing kernel/pipeline/precision against
the pinned ETRS89 1951 full-option artifacts.

The environment cannot run the reference's 2016 oracle
(tests/test_results.py:30-181 methodology; the 2016 meteo is absent), so
the committed artifacts (tests/golden/*.npz, produced by
scripts/make_golden.py on the CPU backend in float64 with the sequential
sub-step pipeline) pin this framework's own outputs. Round-to-round
kernel surgery must keep matching them. Two configurations are pinned,
matching the reference's own oracle matrix (test_results.py:40-99):

- etrs89_1951_fulloption.npz:      6-hourly (NoRoutSteps=6), structures +
                                   split routing, water-use quarter off;
- etrs89_1951_daily_wateruse.npz:  daily (NoRoutSteps=24 — the continental
                                   bench regime) with wateruse + indicator
                                   + riceIrrigation + groundwaterSmooth
                                   active, crossing a month end.
"""
import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"
ARTIFACTS = {"6h": "etrs89_1951_fulloption.npz",
             "daily_wu": "etrs89_1951_daily_wateruse.npz"}

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(CASE)
         and all(os.path.exists(os.path.join(GOLDEN_DIR, f))
                 for f in ARTIFACTS.values())),
    reason="test data or golden artifact missing")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def golden():
    out = {}
    for variant, fname in ARTIFACTS.items():
        path = os.path.join(GOLDEN_DIR, fname)
        with np.load(path) as z:
            out[variant] = {k: z[k] for k in z.files}
    return out


def _compare(dis, end, golden, rtol, atol, ctx):
    g_dis = golden["dis"]
    np.testing.assert_allclose(dis, g_dis, rtol=rtol, atol=atol,
                               err_msg=f"{ctx}: gauge discharge")
    for k, v in end.items():
        g = golden["state_" + k]
        scale = max(np.abs(g).max(), 1.0)
        err = np.abs(v - g).max() / scale
        assert err <= max(rtol, atol), f"{ctx}: state {k} rel-to-max err {err}"


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["6h", "daily_wu"])
def test_default_f64_path_matches_golden(tmp_path, golden, variant):
    """The float64 sequential pipeline reproduces the pinned artifact to
    float64 round-off (same backend, same HLO family)."""
    from make_golden import run_case

    dis, end = run_case(tmp_path, pipeline="substeps", variant=variant)
    _compare(dis, end, golden[variant], rtol=1e-12, atol=1e-12,
             ctx=f"f64 substeps {variant}")


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["6h", "daily_wu"])
def test_diagonal_pipeline_matches_golden(tmp_path, golden, variant):
    """The wavefront-pipelined loop (the f64 auto default) against the
    artifact: only float-grouping (ulp-level) differences allowed."""
    from make_golden import run_case

    dis, end = run_case(tmp_path, pipeline="diagonal", variant=variant)
    _compare(dis, end, golden[variant], rtol=1e-9, atol=1e-9,
             ctx=f"f64 diagonal {variant}")


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["6h", "daily_wu"])
def test_f32_path_matches_golden_at_oracle_tolerance(tmp_path, golden, variant):
    """Precision=single (the TPU production dtype) stays inside the
    reference oracle tolerances (atol=1e-4/rtol=1e-3, reference
    docs/4_annex_tests/index.md:27-30) against the f64 artifact, with
    state fields at the f32 noise floor relative to field scale."""
    import jax.numpy as jnp
    from make_golden import run_case

    dis, end = run_case(tmp_path, pipeline="substeps", dtype=jnp.float32,
                        variant=variant)
    g = golden[variant]
    np.testing.assert_allclose(dis, g["dis"], rtol=1e-3, atol=1e-4,
                               err_msg=f"f32 {variant}: gauge discharge")
    for k, v in end.items():
        gk = g["state_" + k]
        scale = max(np.abs(gk).max(), 1.0)
        err = np.abs(v - gk).max() / scale
        assert err < 5e-3, f"f32 {variant}: state {k} rel-to-max err {err}"
