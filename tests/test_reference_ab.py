"""A/B the ORIGINAL reference CoViAR C loader against codec.coviar_compat.

The reference extension (coviar_data_loader.c) is compiled at test time
straight from /root/reference (never copied into this repo) with a small
API shim (codec/native/av58shim.h) mapping its avcodec-58-era calls onto
the libav 59 present here.  This closes the one semantic loop that round 1
left open: all parity was previously vs a hand-ported NumPy golden model;
here the real decoder reads a real encoded clip.
"""

import os
import subprocess
import sys
import sysconfig

import numpy as np
import pytest

from dmcnet_tpu.codec import coviar_compat
from dmcnet_tpu.codec.mpeg4 import encode_mpeg4

_REF_C = "/root/reference/code/dmcnet/data_loader/coviar_data_loader.c"
_SHIM = os.path.join(os.path.dirname(__file__), "..", "dmcnet_tpu", "codec",
                     "native", "av58shim.h")


def _textured_frames(rng, t, h, w, shift=(2, 1)):
    """Moving-window frames with spatial texture (stable motion search)."""
    pad = 64
    canvas = rng.integers(0, 256, size=(h + 2 * pad, w + 2 * pad, 3))
    canvas = canvas.astype(np.float32)
    c = (canvas[0::2, 0::2] + canvas[1::2, 0::2] + canvas[0::2, 1::2]
         + canvas[1::2, 1::2]) / 4
    canvas = np.kron(c, np.ones((2, 2, 1))).astype(np.uint8)
    return np.stack([
        canvas[pad + shift[1] * i: pad + shift[1] * i + h,
               pad + shift[0] * i: pad + shift[0] * i + w]
        for i in range(t)])


@pytest.fixture(scope="module")
def ref_coviar(tmp_path_factory):
    if not os.path.exists(_REF_C):
        pytest.skip("reference source not available")
    build = tmp_path_factory.mktemp("refbuild")
    out = build / "coviar.so"
    cmd = [
        "gcc", "-O2", "-shared", "-fPIC",
        "-I" + sysconfig.get_paths()["include"],
        "-I" + np.get_include(),
        "-include", os.path.abspath(_SHIM),
        _REF_C,
        "-lavcodec", "-lavformat", "-lavutil", "-lswscale", "-fopenmp",
        "-o", str(out),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"reference build failed: {proc.stderr[-800:]}")
    sys.path.insert(0, str(build))
    try:
        import coviar
    finally:
        sys.path.pop(0)
    return coviar


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    rng = np.random.default_rng(5)
    path = tmp_path_factory.mktemp("clip") / "clip.m4v"
    frames = _textured_frames(rng, t=30, h=96, w=128)
    # raw elementary stream: the reference loader parses the file bytes
    # directly (coviar_data_loader.c:235-269)
    encode_mpeg4(path, frames, gop_size=12, bit_rate=4_000_000,
                 container="m4v")
    return str(path)


def test_counts_match(ref_coviar, clip):
    # The clip really has 30 frames; the reference's count_frames never
    # flushes its parser (coviar_data_loader.c:463-489 has no cur_size==0
    # parse), losing the one frame still buffered — a documented reference
    # bug (PARITY.md quirks).  Our count is the ground truth.
    assert coviar_compat.get_num_frames(clip) == 30
    assert ref_coviar.get_num_frames(clip) == 29
    assert coviar_compat.get_num_gops(clip) == ref_coviar.get_num_gops(clip)


@pytest.mark.parametrize("accumulate", [True, False])
@pytest.mark.parametrize("gop,pos", [(0, 0), (0, 5), (0, 11), (1, 3),
                                     (1, 11), (2, 2)])
def test_mv_bit_parity(ref_coviar, clip, gop, pos, accumulate):
    ref = ref_coviar.load(clip, gop, pos, 1, accumulate)
    assert ref is not None
    ours = coviar_compat.load(clip, gop, pos, 1, accumulate)
    np.testing.assert_array_equal(np.asarray(ours), ref)


@pytest.mark.parametrize("accumulate", [True, False])
@pytest.mark.parametrize("gop,pos", [(0, 0), (0, 5), (0, 11), (1, 3),
                                     (1, 11), (2, 2)])
def test_residual_bit_parity(ref_coviar, clip, gop, pos, accumulate):
    ref = ref_coviar.load(clip, gop, pos, 2, accumulate)
    assert ref is not None
    ours = coviar_compat.load(clip, gop, pos, 2, accumulate)
    np.testing.assert_array_equal(np.asarray(ours), ref)


@pytest.mark.parametrize("gop,pos", [(0, 0), (1, 6)])
def test_iframe_bit_parity(ref_coviar, clip, gop, pos):
    ref = ref_coviar.load(clip, gop, pos, 0, True)
    assert ref is not None
    ours = coviar_compat.load(clip, gop, pos, 0, True)
    np.testing.assert_array_equal(np.asarray(ours), ref)
