"""cli/serve.py end-to-end: checkpoint + synthetic videos -> scores npz.

The output must stay combine-compatible (reference test.py:183-198 layout)
so run_combine.sh fuses it unchanged.
"""

import numpy as np

from tests.test_serving import _encode_panning


def _save_tiny_checkpoint(tmp_path, num_class=5, hw=64):
    import jax
    import jax.numpy as jnp

    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.train.checkpoints import save_checkpoint
    from dmcnet_tpu.train.engine import TrainState

    model = DMCNet(num_class=num_class, num_segments=1,
                   arch_estimator="DenseNetTiny", gen_flow_or_delta=1)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 1, hw, hw, 2)),
                           jnp.zeros((1, 1, hw, hw, 3)), train=False)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_cls=None, opt_gf=None)
    ckpt = str(tmp_path / "serve_checkpoint.pth.tar")
    save_checkpoint(state, {"epoch": 1, "best_prec1": 0.0}, ckpt)
    return ckpt


def test_serve_cli_list_and_npz(tmp_path, capsys):
    from dmcnet_tpu.cli import serve

    for i in range(3):
        _encode_panning(str(tmp_path / f"v{i}.avi"),
                        np.random.default_rng(40 + i), n=14)
    with open(tmp_path / "list.txt", "w") as f:
        for i in range(3):
            f.write(f"v{i}.avi 0 {i % 2}\n")
    ckpt = _save_tiny_checkpoint(tmp_path)

    out = str(tmp_path / "scores.npz")
    scores = serve.main([
        "--weights", ckpt, "--num-class", "5",
        "--data-root", str(tmp_path), "--test-list",
        str(tmp_path / "list.txt"), "--input_size", "64",
        "--frames-per-gop", "2", "--chunk-gops", "8",
        "--save-scores", out,
    ])
    assert len(scores) == 3
    assert all(s.shape == (5,) and np.isfinite(s).all() for s in scores)
    printed = capsys.readouterr().out
    assert "videos/sec" in printed and "Accuracy" in printed

    # combine-compatible layout: object array of ((1, C), label) pairs
    # in sorted-name order, plus labels and names arrays.
    data = np.load(out, allow_pickle=True)
    assert list(data["names"]) == ["v0.avi", "v1.avi", "v2.avi"]
    assert list(data["labels"]) == [0, 1, 0]
    pair = data["scores"][1]
    assert pair[0].shape == (1, 5) and pair[1] == 1
    np.testing.assert_allclose(pair[0][0], scores[1], rtol=1e-6)


def test_serve_cli_stdin_daemon(tmp_path, monkeypatch, capsys):
    """--stdin daemon: one JSON result line per request (bare path or JSON
    request with an id), errors answered in-band without killing the loop,
    predictions identical to batch mode."""
    import io
    import json
    import sys as _sys

    from dmcnet_tpu.cli import serve

    for i in range(2):
        _encode_panning(str(tmp_path / f"v{i}.avi"),
                        np.random.default_rng(60 + i), n=14)
    garbage = tmp_path / "bad.avi"
    garbage.write_bytes(b"not a video")
    ckpt = _save_tiny_checkpoint(tmp_path)

    requests = "\n".join([
        str(tmp_path / "v0.avi"),
        json.dumps({"path": str(tmp_path / "v1.avi"), "id": "req-7"}),
        str(garbage),
        "{bad json",
    ]) + "\n"
    monkeypatch.setattr(_sys, "stdin", io.StringIO(requests))
    serve.main(["--weights", ckpt, "--num-class", "5",
                "--input_size", "64", "--frames-per-gop", "2",
                "--chunk-gops", "8", "--stdin"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 4
    assert lines[0]["path"].endswith("v0.avi") and "pred" in lines[0]
    assert lines[1]["id"] == "req-7" and "pred" in lines[1]
    assert "error" in lines[2]  # corrupt video answered in-band
    assert "error" in lines[3]  # bad json answered in-band
    assert all(l["ms"] >= 0 for l in lines if "ms" in l)

    # daemon predictions == batch mode on the same videos
    batch = serve.main(["--weights", ckpt, "--num-class", "5",
                        "--input_size", "64", "--frames-per-gop", "2",
                        "--chunk-gops", "8",
                        str(tmp_path / "v0.avi"), str(tmp_path / "v1.avi")])
    assert lines[0]["pred"] == int(np.argmax(batch[0]))
    assert lines[1]["pred"] == int(np.argmax(batch[1]))


def test_serve_cli_bare_paths(tmp_path, capsys):
    from dmcnet_tpu.cli import serve

    p = str(tmp_path / "x.avi")
    _encode_panning(p, np.random.default_rng(50), n=14)
    ckpt = _save_tiny_checkpoint(tmp_path)
    scores = serve.main(["--weights", ckpt, "--num-class", "5",
                         "--input_size", "64", p])
    assert len(scores) == 1 and scores[0].shape == (5,)
    assert "pred=" in capsys.readouterr().out


def test_serve_cli_on_error_zero(tmp_path, capsys):
    """A corrupt video zero-scores instead of killing the batch when
    --on-error zero (reference stance: dmcnet dataset.py zero-fill)."""
    import pytest

    from dmcnet_tpu.cli import serve

    good = str(tmp_path / "good.avi")
    _encode_panning(good, np.random.default_rng(90), n=14)
    bad = str(tmp_path / "bad.avi")
    with open(bad, "wb") as f:
        f.write(b"\x00garbage-not-a-video\xff" * 64)
    ckpt = _save_tiny_checkpoint(tmp_path)

    with pytest.raises(Exception):
        serve.main(["--weights", ckpt, "--num-class", "5",
                    "--input_size", "64", good, bad])

    scores = serve.main(["--weights", ckpt, "--num-class", "5",
                         "--input_size", "64", "--on-error", "zero",
                         good, bad])
    assert np.isfinite(scores[0]).all() and np.any(scores[0] != 0)
    np.testing.assert_array_equal(scores[1], np.zeros(5, np.float32))


def test_serve_from_orbax_checkpoint(tmp_path):
    """A --ckpt-backend orbax training checkpoint (directory) serves
    directly: from_checkpoint restores params/batch_stats only, ignoring
    optimizer moments absent from the serving template."""
    import jax
    import jax.numpy as jnp

    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.serving import DMCPredictor
    from dmcnet_tpu.train.checkpoints import save_checkpoint_orbax
    from dmcnet_tpu.train.engine import TrainState

    hw, num_class = 64, 5
    model = DMCNet(num_class=num_class, num_segments=1,
                   arch_estimator="DenseNetTiny", gen_flow_or_delta=1)
    variables = model.init(jax.random.key(1),
                           jnp.zeros((1, 1, hw, hw, 2)),
                           jnp.zeros((1, 1, hw, hw, 3)), train=False)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_cls={"mu": np.ones(3)}, opt_gf={"nu": np.ones(2)})
    ckdir = str(tmp_path / "orbax_ck")
    save_checkpoint_orbax(state, {"epoch": 2}, ckdir)

    pred = DMCPredictor.from_checkpoint(ckdir, num_class=num_class,
                                        input_size=hw)
    p = str(tmp_path / "v.avi")
    _encode_panning(p, np.random.default_rng(99), n=14)
    scores = pred.predict_video(p, backend="host")
    assert scores.shape == (num_class,) and np.isfinite(scores).all()


def test_dispatcher_exit_code_for_domain_returns(monkeypatch):
    """Drivers return domain values (floats/lists); the dispatcher must
    map completion-without-exception to exit status 0."""
    import dmcnet_tpu.cli.combine as combine_mod
    from dmcnet_tpu import __main__ as top

    monkeypatch.setattr(combine_mod, "main", lambda argv=None: 0.6405)
    assert top.main(["combine"]) == 0


def test_on_error_zero_device_backend(tmp_path):
    """Strict device mode + on_error zero: an unreadable video zero-scores
    instead of aborting the batch; without it the real error surfaces."""
    import pytest

    from dmcnet_tpu.serving import DMCPredictor
    from tests.test_serving import _make_predictor

    good = str(tmp_path / "g.avi")
    _encode_panning(good, np.random.default_rng(101), n=14)
    bad = str(tmp_path / "b.avi")
    with open(bad, "wb") as f:
        f.write(b"nope" * 200)
    pred = _make_predictor()
    with pytest.raises(Exception):
        pred.predict_videos([good, bad], backend="device", chunk_gops=4)
    scores = pred.predict_videos([good, bad], backend="device",
                                 chunk_gops=4, on_error="zero")
    assert np.any(scores[0] != 0)
    np.testing.assert_array_equal(scores[1], np.zeros(7, np.float32))


def test_on_error_zero_reraises_infra_errors(tmp_path, monkeypatch):
    """Device/infra failures (XlaRuntimeError, OOM) abort even under
    on_error zero — zero-scoring a systemic outage would report garbage
    accuracy as success."""
    import pytest

    from tests.test_serving import _make_predictor

    bad = str(tmp_path / "b.avi")
    with open(bad, "wb") as f:
        f.write(b"nope" * 200)
    pred = _make_predictor()

    class XlaRuntimeError(RuntimeError):
        pass

    def boom(*a, **k):
        raise XlaRuntimeError("tunnel dropped")

    monkeypatch.setattr(pred, "predict_video", boom)
    with pytest.raises(XlaRuntimeError):
        pred.predict_videos([bad], chunk_gops=4, on_error="zero")


def test_predict_videos_duplicate_paths(tmp_path):
    """The same path repeated in one predict_videos call: every position
    gets the correct score (gathered/scored once, fanned out), positions
    never alias (in-place weighting of one must not touch the other), and
    the scores equal the unduplicated run."""
    from tests.test_serving import _make_predictor

    a = str(tmp_path / "a.avi")
    b = str(tmp_path / "b.avi")
    _encode_panning(a, np.random.default_rng(130), n=14)
    _encode_panning(b, np.random.default_rng(131), n=14)
    pred = _make_predictor()

    solo = pred.predict_videos([a, b], chunk_gops=4)
    dup = pred.predict_videos([a, b, a, a, b], chunk_gops=4)
    want = [solo[0], solo[1], solo[0], solo[0], solo[1]]
    for got, w in zip(dup, want):
        np.testing.assert_allclose(got, w, rtol=1e-5, atol=1e-6)
    # positions never alias: scaling one occurrence leaves the others
    dup[2] *= 0.0
    assert np.any(dup[0] != 0) and np.any(dup[3] != 0)


def test_serve_cli_stdin_interleaved_duplicates(tmp_path, monkeypatch,
                                                capsys):
    """Daemon mode with interleaved requests including the same path twice
    (and as a duplicate within a single line of traffic): each request gets
    its own result line, ids preserved, duplicate requests agree."""
    import io
    import json
    import sys as _sys

    from dmcnet_tpu.cli import serve

    v0 = str(tmp_path / "v0.avi")
    v1 = str(tmp_path / "v1.avi")
    _encode_panning(v0, np.random.default_rng(140), n=14)
    _encode_panning(v1, np.random.default_rng(141), n=14)
    ckpt = _save_tiny_checkpoint(tmp_path)

    requests = "\n".join([
        v0,
        json.dumps({"path": v1, "id": "first-v1"}),
        json.dumps({"path": v0, "id": "again-v0"}),
        v1,
    ]) + "\n"
    monkeypatch.setattr(_sys, "stdin", io.StringIO(requests))
    serve.main(["--weights", ckpt, "--num-class", "5",
                "--input_size", "64", "--frames-per-gop", "2",
                "--chunk-gops", "8", "--stdin"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert len(lines) == 4
    assert all("pred" in l for l in lines)
    assert lines[2]["id"] == "again-v0"
    # duplicate requests for the same video agree with each other
    assert lines[0]["pred"] == lines[2]["pred"]
    assert np.isclose(lines[0]["score"], lines[2]["score"], rtol=1e-5)
    assert lines[1]["pred"] == lines[3]["pred"]


def test_serve_cli_mesh_devices(tmp_path):
    """--mesh-devices shards GOP batches over the virtual 8-device mesh;
    scores match the single-device run."""
    from dmcnet_tpu.cli import serve

    paths = []
    for i in range(2):
        p = str(tmp_path / f"m{i}.avi")
        _encode_panning(p, np.random.default_rng(110 + i), n=14)
        paths.append(p)
    ckpt = _save_tiny_checkpoint(tmp_path)
    base = ["--weights", ckpt, "--num-class", "5", "--input_size", "64",
            "--chunk-gops", "8"]
    single = serve.main(base + paths)
    sharded = serve.main(base + ["--mesh-devices", "8"] + paths)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_serve_from_gan_checkpoint(tmp_path):
    """A GAN-trained checkpoint (extra discriminator params) serves: the
    params-only loader drops subtrees absent from the serving template."""
    import jax
    import jax.numpy as jnp

    from dmcnet_tpu.models import DMCNet
    from dmcnet_tpu.serving import DMCPredictor
    from dmcnet_tpu.train.checkpoints import save_checkpoint
    from dmcnet_tpu.train.engine import TrainState

    hw, num_class = 64, 5
    gan = DMCNet(num_class=num_class, num_segments=1,
                 arch_estimator="DenseNetTiny", gen_flow_or_delta=1,
                 arch_d="Discriminator4", detach_classifier=False)
    variables = gan.init(jax.random.key(0),
                         jnp.zeros((1, 1, hw, hw, 2)),
                         jnp.zeros((1, 1, hw, hw, 3)), train=False)
    assert "discriminator" in variables["params"]
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_cls=None, opt_gf=None)
    ckpt = str(tmp_path / "gan_checkpoint.pth.tar")
    save_checkpoint(state, {"epoch": 3}, ckpt)

    pred = DMCPredictor.from_checkpoint(ckpt, num_class=num_class,
                                        input_size=hw)
    p = str(tmp_path / "v.avi")
    _encode_panning(p, np.random.default_rng(120), n=14)
    scores = pred.predict_video(p, backend="host")
    assert scores.shape == (num_class,) and np.isfinite(scores).all()
