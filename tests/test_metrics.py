"""Metrics/observability smoke tests (SURVEY.md §5)."""
import io
import json

from base_tpu.utils.metrics import MetricsLogger, debug_guards, named_scope


def test_metrics_jsonl_stream():
    buf = io.StringIO()
    m = MetricsLogger(stream=buf)
    m.log("warmup_done", accept=0.82, window=3)
    m.throughput("sampling", n_samples=1000, n_evals=24000, seconds=2.0,
                 chains=64)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert lines[0]["event"] == "warmup_done"
    assert abs(lines[0]["accept"] - 0.82) < 1e-9
    assert lines[1]["samples_per_sec"] == 500.0
    assert lines[1]["evals_per_sec"] == 12000.0
    assert lines[1]["dt"] >= 0


def test_named_scope_and_guards():
    import jax.numpy as jnp

    with debug_guards(enable=True):
        with named_scope("likelihood"):
            x = jnp.ones(4) * 2.0
        assert float(x.sum()) == 8.0
    # config restored
    import jax

    assert jax.config.jax_debug_nans is False
