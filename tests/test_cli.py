"""CLI-layer tests: combine fusion golden values, npz writer compatibility."""

import os

import numpy as np
import pytest

from dmcnet_tpu.cli.combine import combine, load_scores
from dmcnet_tpu.cli.test import save_scores_npz

REF = "/root/reference/exp_my"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference artifacts absent")
def test_combine_matches_reference_hmdb51_split1_gan():
    """Recompute the shipped HMDB-51 split1 4-modality fusion: 64.05%
    (BASELINE.md verified table)."""
    acc, n = combine(
        iframe=f"{REF}/hmdb51_coviar/iframe/split1/iframe_score_model_best.npz",
        mv=f"{REF}/hmdb51_coviar/mv/split1/mv_score_model_best.npz",
        res=f"{REF}/hmdb51_coviar/residual/split1/residual_score_model_best.npz",
        flow=f"{REF}/hmdb51_gan/split1/mv_score_model_best.npz")
    assert n == 1530
    assert abs(acc - 0.6405) < 0.0006, acc


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference artifacts absent")
def test_combine_three_modality_coviar():
    acc, _ = combine(
        iframe=f"{REF}/hmdb51_coviar/iframe/split1/iframe_score_model_best.npz",
        mv=f"{REF}/hmdb51_coviar/mv/split1/mv_score_model_best.npz",
        res=f"{REF}/hmdb51_coviar/residual/split1/residual_score_model_best.npz")
    assert abs(acc - 0.6203) < 0.0006, acc


def test_npz_roundtrip_and_reorder(tmp_path):
    """Writer must reorder by sorted name and keep the reference's object
    layout (scores[i] = (score (1, C), label))."""
    rng = np.random.default_rng(0)
    names = ["c/vid2.avi", "a/vid0.avi", "b/vid1.avi"]
    outputs = [(rng.normal(size=(1, 4)).astype(np.float32), i)
               for i in range(3)]
    labels = [o[1] for o in outputs]
    path = tmp_path / "scores.npz"
    save_scores_npz(path, outputs, labels, names)

    with np.load(path, allow_pickle=True) as data:
        assert list(data["names"]) == sorted(names)
        # name[0] (c/vid2) sorts last -> its score lands at index 2.
        np.testing.assert_array_equal(data["scores"][2][0], outputs[0][0])
        assert data["scores"][2][1] == 0
        assert list(data["labels"]) == [1, 2, 0]

    scores, lab, n = load_scores(path)
    assert scores.shape == (3, 4) and n == 3
    assert list(lab) == [1, 2, 0]


def test_combine_on_own_npz(tmp_path):
    """Fusing our own writer's files reproduces hand-computed accuracy."""
    rng = np.random.default_rng(1)
    names = [f"x/v{i}.avi" for i in range(6)]
    files = {}
    per_mod = {}
    for mod in ("iframe", "mv", "res", "flow"):
        outputs = [(rng.normal(size=(1, 3)).astype(np.float32), i % 3)
                   for i in range(6)]
        per_mod[mod] = outputs
        p = tmp_path / f"{mod}.npz"
        save_scores_npz(p, outputs, [o[1] for o in outputs], names)
        files[mod] = str(p)
    acc, n = combine(files["iframe"], files["mv"], files["res"],
                     files["flow"])
    fused = (2.0 * np.stack([o[0][0] for o in per_mod["iframe"]])
             + np.stack([o[0][0] for o in per_mod["mv"]])
             + np.stack([o[0][0] for o in per_mod["res"]])
             + np.stack([o[0][0] for o in per_mod["flow"]]))
    expect = np.mean(np.argmax(fused, 1) == np.arange(6) % 3)
    assert n == 6 and abs(acc - expect) < 1e-9


def test_top_level_dispatcher(capsys):
    """python -m dmcnet_tpu <command> routes to the right driver with the
    alias kwargs (gan=True, dataset defaults) preserved."""
    from dmcnet_tpu import __main__ as top

    assert top.main([]) == 0
    assert "serve" in capsys.readouterr().out
    assert top.main(["not-a-command"]) == 2

    from dmcnet_tpu.cli import train_gan, train_hmdb51, train_ucf101
    seen = {}

    def fake_train(argv=None, **kw):
        seen.update(kw)
        return 0

    import dmcnet_tpu.cli.train_gan as tg
    orig = tg._train_main
    tg._train_main = fake_train
    try:
        train_gan.main([])
        assert seen.get("gan") is True
    finally:
        tg._train_main = orig

    import dmcnet_tpu.cli.train_hmdb51 as th
    import dmcnet_tpu.cli.train_ucf101 as tu
    for mod, want in ((th, "HMDB51"), (tu, "UCF101")):
        seen.clear()
        orig = mod._i3d_main
        mod._i3d_main = fake_train
        try:
            mod.main([])
            assert seen.get("dataset_default") == want
        finally:
            mod._i3d_main = orig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference artifacts absent")
def test_parity_harness_scores_mode(tmp_path):
    """examples/parity/run.sh (SCORES mode) asserts the exact shipped
    fusion numbers (62.03% / 64.05%, BASELINE.md) through the CLI chain."""
    import subprocess
    env = dict(os.environ, SCORES=REF, OUT=str(tmp_path))
    proc = subprocess.run([os.path.join(REPO, "examples/parity/run.sh")],
                          env=env, capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PARITY OK [CoViAR 3-mod split1]" in proc.stdout
    assert "PARITY OK [4-mod + DMC split1]" in proc.stdout


def test_parity_harness_skips_cleanly(tmp_path):
    """With neither $SCORES nor the full-mode inputs, the harness must
    SKIP (exit 0) — CI-safe on machines without data/checkpoints."""
    import subprocess
    env = {k: v for k, v in os.environ.items()
           if k not in ("SCORES", "DATA_ROOT", "TEST_LIST", "CKPTS")}
    env["OUT"] = str(tmp_path)
    proc = subprocess.run([os.path.join(REPO, "examples/parity/run.sh")],
                          env=env, capture_output=True, text=True,
                          timeout=60)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "SKIP" in proc.stdout
