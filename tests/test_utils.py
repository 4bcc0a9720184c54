"""Utility subsystems: sanitizers, metrics logging, host IO, profiling."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icassp2022_depression_tpu.utils import debug, hostio, logging as ulog
from icassp2022_depression_tpu.utils import profiling


def test_nan_debug_raises_on_nan():
    with pytest.raises(FloatingPointError):
        with debug.nan_debug():
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    # config restored afterwards
    assert not jax.config.jax_debug_nans
    jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0))  # no raise outside


def test_assert_tree_finite_names_the_leaf():
    tree = {"a": jnp.ones(3), "b": {"w": jnp.asarray([1.0, np.inf])}}
    with pytest.raises(ValueError, match="tree/b/w"):
        debug.assert_tree_finite(tree)
    debug.assert_tree_finite({"a": jnp.ones(3)})  # clean tree passes


def test_assert_batch_shapes():
    x = jnp.zeros((4, 3, 8))
    y = jnp.zeros((4,))
    debug.assert_batch_shapes(x, y, jnp.ones((4,)))
    with pytest.raises(AssertionError):
        debug.assert_batch_shapes(x, jnp.zeros((5,)))


def test_tree_norms():
    norms = debug.tree_norms({"w": jnp.asarray([3.0, 4.0])})
    assert norms["w"] == pytest.approx(5.0)


def test_metrics_logger_jsonl_and_fold(tmp_path):
    path = tmp_path / "m.jsonl"
    logger = ulog.MetricsLogger(path)
    logger.log("epoch", loss=np.float32(0.5), step=np.int64(3))
    logger.log_fold("audio_clf", 1,
                    {"loss": np.asarray([0.5, 0.4]),
                     "f1": np.asarray([0.6, 0.7])},
                    {"f1": 0.7, "epoch": 1, "params": {"w": jnp.ones(2)}})
    lines = [json.loads(line) for line in path.read_text().splitlines()]
    assert lines[0]["event"] == "epoch"
    assert lines[0]["loss"] == pytest.approx(0.5)  # numpy scalars JSON-safe
    fold_line = next(ln for ln in lines if ln.get("fold") == 1)
    assert fold_line["trainer"] == "audio_clf"
    assert "params" not in json.dumps(fold_line)   # params never logged


def test_logging_formats_match_reference_conventions():
    s = ulog.format_confusion_matrix(np.asarray([[3, 1], [2, 4]]))
    assert "3" in s and "4" in s
    assert "epoch" in ulog.format_epoch_clf(2, 1e-5, 0.3, 5, 8).lower()
    assert "mae" in ulog.format_eval_reg(7.5, 9.0).lower()


def test_gather_chunks_edges():
    assert hostio.gather_chunks([], 0).shape == (0, 0)
    one = hostio.gather_chunks([jnp.ones((4, 2))], 3)
    assert one.shape == (3, 2)
    two = hostio.gather_chunks([jnp.zeros((2, 2)), jnp.ones((2, 2))], 3)
    np.testing.assert_array_equal(two, [[0, 0], [0, 0], [1, 1]])


def test_stopwatch_and_annotate():
    sw = profiling.Stopwatch()
    with sw.section("a"):
        pass
    with profiling.annotate("outer"):
        with sw.section("a"):
            pass
    assert "a" in sw.report()


def test_next_pow2_policy():
    from icassp2022_depression_tpu.utils import shapes

    assert [shapes.next_pow2(n) for n in (0, 1, 2, 3, 5, 8, 9)] == \
        [1, 1, 2, 4, 8, 8, 16]
    assert shapes.next_pow2(5, minimum=16384) == 16384
    assert shapes.next_pow2(16385, minimum=16384) == 32768


def test_gather_chunks_empty_keeps_dim():
    import numpy as np

    from icassp2022_depression_tpu.utils import hostio

    assert hostio.gather_chunks([], 0, 1024).shape == (0, 1024)


def test_optimizer_unknown_name_raises():
    import jax
    import pytest

    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.train import optim

    params = {"w": jax.numpy.zeros((2, 2))}
    with pytest.raises(ValueError, match="unknown optimizer"):
        optim.build(C.OptimizerConfig(name="sgd"), params)
    with pytest.raises(ValueError, match="unknown optimizer"):
        optim.build(C.OptimizerConfig(name="adamW"), params)


def test_checkpoint_save_accepts_npz_suffixed_path(tmp_path):
    """save('x.npz') and load('x.npz') target the SAME file (mirrored
    suffix handling), instead of silently writing x.npz.npz."""
    import jax.numpy as jnp

    from icassp2022_depression_tpu.train import checkpoints

    params = {"w": jnp.arange(4.0)}
    out = checkpoints.save(tmp_path / "ck.npz", params, {"k": 1})
    assert out == tmp_path / "ck.npz"
    assert not (tmp_path / "ck.npz.npz").exists()
    back = checkpoints.load(tmp_path / "ck.npz", like=params)
    np.testing.assert_array_equal(np.asarray(back["w"]),
                                  np.asarray(params["w"]))
    assert checkpoints.load_meta(tmp_path / "ck") == {"k": 1}


def test_next_pow2_rejects_nonpositive_minimum():
    from icassp2022_depression_tpu.utils import shapes

    with pytest.raises(ValueError, match="positive"):
        shapes.next_pow2(5, minimum=0)


def test_next_quantized_policy():
    """1/8-pow2 quantization for large relay-shipped axes: overhead is
    bounded by 12.5%, values are multiples of pow2-below/8, and the
    result never drops below the pow2 floor behaviors."""
    from icassp2022_depression_tpu.utils import shapes

    m = 16384
    assert shapes.next_quantized(0, minimum=m) == m
    assert shapes.next_quantized(m, minimum=m) == m
    # just past the minimum: one 1/8 step above, not a full doubling
    assert shapes.next_quantized(m + 1, minimum=m) == m + m // 8
    # pow2 values are fixed points
    assert shapes.next_quantized(4 * m, minimum=m) == 4 * m
    rng = np.random.default_rng(0)
    for n in rng.integers(1, 1 << 27, size=200):
        n = int(n)
        q = shapes.next_quantized(n, minimum=m)
        assert q >= n
        assert q <= shapes.next_pow2(n, minimum=m)
        assert (q - n) / n <= 0.125 or q == m
        # step granularity: q is a multiple of (pow2 below n) / 8
        p = m
        while p * 2 < n:
            p *= 2
        assert q % (p // 8) == 0

    with pytest.raises(ValueError, match="divide"):
        shapes.next_quantized(5, minimum=12, frac=8)
    with pytest.raises(ValueError, match="positive"):
        shapes.next_quantized(5, minimum=0)


def test_probe_weather_reports_link_condition():
    """The relay weather probe (bench context line + `cli doctor`) must
    return positive, JSON-able numbers on any backend."""
    from icassp2022_depression_tpu.utils.relay import probe_weather

    wx = probe_weather(size_mb=0.5, reps=2)
    assert wx["backend"] == "cpu" and wx["reps"] == 2
    assert wx["probe_mb"] == pytest.approx(0.5, rel=0.01)
    assert wx["roundtrip_s"] >= 0.0
    assert wx["up_mb_s"] > 0 and wx["down_mb_s"] > 0
    assert len(wx["up_s"]) == 2 and len(wx["down_s"]) == 2
    json.dumps(wx)  # must be emittable as a bench JSON line
