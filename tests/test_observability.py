import time

from vector_db_tpu.observability import Timer, annotate, trace


def test_timer_spans():
    t = Timer()
    with t.span("a"):
        time.sleep(0.01)
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    snap = t.snapshot()
    assert snap["a"]["count"] == 2
    assert snap["a"]["total_s"] >= 0.01
    assert snap["b"]["count"] == 1
    t.reset()
    assert t.snapshot() == {}


def test_annotate_context():
    with annotate("test-span"):
        pass  # must not raise


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    with trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    # a TensorBoard-loadable profile must exist: the profile plugin
    # looks for plugins/profile/<run>/<host>.xplane.pb
    produced = list(tmp_path.rglob("*"))
    assert produced, "profiler produced no output"
    xplanes = list(tmp_path.rglob("*.xplane.pb"))
    assert xplanes, f"no .xplane.pb in trace dir (got {produced})"
    assert xplanes[0].stat().st_size > 0
    assert "plugins" in {p.name for p in tmp_path.iterdir()}, (
        "trace dir missing the plugins/ root TensorBoard expects")
