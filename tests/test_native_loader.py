"""Tests for the native C++ threaded LM batch loader (csrc/dataloader.cpp)."""

import os
import tempfile

import numpy as np
import pytest

from flashfftconv_tpu.utils import native_loader


@pytest.fixture(scope="module")
def corpus():
    data = (np.arange(50000) % 251).astype(np.uint8)
    with tempfile.NamedTemporaryFile(delete=False, suffix=".bin") as f:
        f.write(data.tobytes())
        path = f.name
    yield path, data
    os.unlink(path)


pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built (needs g++)"
)


def test_shapes_and_shift(corpus):
    path, data = corpus
    dl = native_loader.NativeLMLoader(path, batch_size=4, seq_len=32, seed=0)
    assert dl.num_tokens == len(data)
    x, y = dl.next()
    assert x.shape == (4, 32) and x.dtype == np.int32
    np.testing.assert_array_equal(x[:, 1:], y[:, :-1])
    # values come from the corpus
    assert (x >= 0).all() and (x < 251).all()
    dl.close()


def test_deterministic_and_restore(corpus):
    path, _ = corpus
    a = native_loader.NativeLMLoader(path, batch_size=2, seq_len=16, seed=7)
    b = native_loader.NativeLMLoader(path, batch_size=2, seq_len=16, seed=7)
    xa, _ = a.next()
    xb, _ = b.next()
    np.testing.assert_array_equal(xa, xb)

    st = a.state()
    nxt, _ = a.next()
    a.restore(st)
    replay, _ = a.next()
    np.testing.assert_array_equal(nxt, replay)
    a.close()
    b.close()


def test_different_seeds_differ(corpus):
    path, _ = corpus
    a = native_loader.NativeLMLoader(path, batch_size=2, seq_len=16, seed=1)
    b = native_loader.NativeLMLoader(path, batch_size=2, seq_len=16, seed=2)
    xa, _ = a.next()
    xb, _ = b.next()
    assert not (np.asarray(xa) == np.asarray(xb)).all()
    a.close()
    b.close()


def test_int32_corpus():
    data = (np.arange(10000) * 7 % 5000).astype(np.int32)
    with tempfile.NamedTemporaryFile(delete=False, suffix=".bin") as f:
        f.write(data.tobytes())
        path = f.name
    try:
        dl = native_loader.NativeLMLoader(path, 2, 8, seed=0, is_int32=True)
        assert dl.num_tokens == len(data)
        x, y = dl.next()
        assert (x < 5000).all()
        np.testing.assert_array_equal(x[:, 1:], y[:, :-1])
        dl.close()
    finally:
        os.unlink(path)


def test_create_failure_raises():
    with pytest.raises(OSError):
        native_loader.NativeLMLoader("/nonexistent/file.bin", 2, 8)
