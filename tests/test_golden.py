"""Golden regression gate: every routing kernel/pipeline/precision against
the pinned ETRS89 1951 full-option artifact.

The environment cannot run the reference's 2016 oracle
(tests/test_results.py:30-181 methodology; the 2016 meteo is absent), so
the committed artifact (tests/golden/etrs89_1951_fulloption.npz, produced
by scripts/make_golden.py on the CPU backend in float64 with the
sequential sub-step pipeline) pins this framework's own outputs.
Round-to-round kernel surgery must keep matching it.
"""
import os
import sys

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "etrs89_1951_fulloption.npz")
CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(CASE) and os.path.exists(GOLDEN)),
    reason="test data or golden artifact missing")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def golden():
    with np.load(GOLDEN) as z:
        return {k: z[k] for k in z.files}


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
def test_default_f64_path_matches_golden(tmp_path, golden):
    """The float64 sequential pipeline reproduces the pinned artifact to
    float64 round-off (same backend, same HLO family)."""
    from make_golden import run_case

    dis, end = run_case(tmp_path, pipeline="substeps")
    _compare(dis, end, golden, rtol=1e-12, atol=1e-12, ctx="f64 substeps")


@pytest.mark.slow
def test_diagonal_pipeline_matches_golden(tmp_path, golden):
    """The wavefront-pipelined loop (the f64 auto default) against the
    artifact: only float-grouping (ulp-level) differences allowed."""
    from make_golden import run_case

    dis, end = run_case(tmp_path, pipeline="diagonal")
    _compare(dis, end, golden, rtol=1e-9, atol=1e-9, ctx="f64 diagonal")


@pytest.mark.slow
def test_f32_path_matches_golden_at_oracle_tolerance(tmp_path, golden):
    """Precision=single (the TPU production dtype) stays inside the
    reference oracle tolerances (atol=1e-4/rtol=1e-3, reference
    docs/4_annex_tests/index.md:27-30) against the f64 artifact, with
    state fields at the f32 noise floor relative to field scale."""
    import jax.numpy as jnp
    from make_golden import run_case

    dis, end = run_case(tmp_path, pipeline="substeps", dtype=jnp.float32)
    g_dis = golden["dis"]
    np.testing.assert_allclose(dis, g_dis, rtol=1e-3, atol=1e-4,
                               err_msg="f32: gauge discharge")
    for k, v in end.items():
        g = golden["state_" + k]
        scale = max(np.abs(g).max(), 1.0)
        err = np.abs(v - g).max() / scale
        assert err < 5e-3, f"f32: state {k} rel-to-max err {err}"
