"""Regression tests for the measurement tooling that produces committed
evidence (they have bitten before: the round-4 dp audit misparsed variadic
tuple all-reduces as 0-byte scalars and the committed JSON contradicted the
PLAN narrative — VERDICT r4 #3)."""
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "profiling"))


def test_hlo_tuple_type_bytes():
    """The exact line shape that broke the round-4 parser: a variadic
    tuple all-reduce whose type contains spaces AND /*index=N*/ comments
    (which contain '=')."""
    from dp_scaling import _type_bytes_and_shapes
    t = ("(f32[], f32[], f32[10,3]{1,0}, f32[128]{0}, f32[128,32]{1,0}, "
         "/*index=5*/f32[131072,72]{1,0})")
    nbytes, shapes = _type_bytes_and_shapes(t)
    expected = 4 * (1 + 1 + 30 + 128 + 128 * 32 + 131072 * 72)
    assert nbytes == expected
    assert "f32[131072,72]" in shapes
    # scalar-only tuples stay tiny
    nb2, _ = _type_bytes_and_shapes("(f32[], s32[])")
    assert nb2 == 8


def test_audit_regex_on_real_lines():
    """audit_hlo's line scan must catch both the simple and the variadic
    forms, skip -done halves of async pairs, and not trip on op names
    embedded in metadata strings."""
    import re
    from dp_scaling import audit_hlo

    class FakeCompiled:
        def as_text(self):
            return "\n".join([
                "  %all-reduce.52 = (f32[], f32[128,32]{1,0}, "
                "/*index=5*/f32[131072,72]{1,0}) all-reduce(%a, %b, %c), "
                "replica_groups=[1,8]<=[8], metadata={op_name=\"psum\"}",
                "  %ag = f32[5000]{0} all-gather(%x), dimensions={0}",
                "  %ard = f32[8]{0} all-reduce-done(%ars)",
                "  %ars = f32[8]{0} all-reduce-start(%y)",
                "  %plainop = f32[8]{0} add(%y, %y), metadata="
                "{op_name=\"not-an-all-reduce(really)\"}",
            ])

    colls, grad_reduces, fatal, btot, _ = audit_hlo(FakeCompiled(), 131072)
    ops = sorted(c["op"] for c in colls)
    assert ops == ["all-gather", "all-reduce", "all-reduce"]
    assert len(grad_reduces) == 1           # the (CAP,72)-carrying one
    assert fatal == []                      # all-gather doesn't touch CAP,72
    assert btot > 131072 * 72 * 4


def test_roofline_model_shapes():
    """Model totals respond to CAP (Adam/zeros sweeps) and to the ray
    batch, and every rung carries the fields ideal_ms needs."""
    import jax
    from roofline import iteration_model, ideal_ms, gather_bytes_effective

    rungs, peak = iteration_model(R=1000, cap=1 << 15)
    rungs_big, _ = iteration_model(R=1000, cap=1 << 17)
    assert rungs_big["adam_sweep"]["hbm_bytes"] == \
        4 * rungs["adam_sweep"]["hbm_bytes"]
    for r in rungs.values():
        t, parts = ideal_ms(r, peak)
        assert t >= 0 and set(parts) == {"mxu_ms", "vpu_ms", "stream_ms",
                                         "gather_ms"}
    # sub-granule random touches pay the 32 B granule
    assert gather_bytes_effective((100, 4)) == 3200
    assert gather_bytes_effective((100, 288)) == 28800


def test_memory_report_keys():
    from point_slam_tpu.utils.memory import memory_report
    rep = memory_report()
    assert "host_peak_rss_bytes" in rep and rep["host_peak_rss_bytes"] > 0
    # device side present in some form on any backend with a client
    assert any(k.startswith("device_") for k in rep)


def test_product_dirty_scope(tmp_path):
    """The gate's dirty check only counts PRODUCT paths: evidence files a
    previous gate/bench wrote (output/, docs/) must not block a standing
    run, while uncommitted product code must."""
    import subprocess
    import quality_gate as qg

    repo = tmp_path / "repo"
    repo.mkdir()
    run = lambda *a: subprocess.run(a, cwd=repo, capture_output=True,
                                    check=True)
    run("git", "init", "-q")
    run("git", "config", "user.email", "t@t")
    run("git", "config", "user.name", "t")
    (repo / "point_slam_tpu").mkdir()
    (repo / "point_slam_tpu" / "a.py").write_text("x = 1\n")
    (repo / "output").mkdir()
    (repo / "output" / "gate.json").write_text("{}\n")
    run("git", "add", "-A")
    run("git", "commit", "-qm", "init")

    assert not qg.product_dirty(cwd=str(repo))
    # evidence churn: not dirty
    (repo / "output" / "gate.json").write_text('{"new": 1}\n')
    assert not qg.product_dirty(cwd=str(repo))
    # product churn: dirty
    (repo / "point_slam_tpu" / "a.py").write_text("x = 2\n")
    assert qg.product_dirty(cwd=str(repo))
