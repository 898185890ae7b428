"""Native C++ WordPiece: parity with the Python engine + throughput sanity."""
import time

import numpy as np
import pytest

from eeg_multimodal_tpu import native
from eeg_multimodal_tpu.data import tokenizer as T


@pytest.fixture(scope="module")
def py_tok():
    return T.synthetic_numeric_vocab()


@pytest.fixture(scope="module")
def nat_tok(py_tok):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.NativeWordPiece.from_wordpiece(py_tok)


def test_native_matches_python_engine(py_tok, nat_tok):
    rng = np.random.RandomState(0)
    texts = [
        " ".join(str(v) for v in rng.randint(-5000, 5000, size=30))
        for _ in range(50)
    ]
    for t in texts:
        ids_py, mask_py = py_tok.encode(t, 128)
        ids_c, mask_c = nat_tok.encode(t, 128)
        np.testing.assert_array_equal(ids_c, ids_py)
        np.testing.assert_array_equal(mask_c, mask_py)


def test_native_batch_matches_single(nat_tok):
    texts = ["1 2 3", "-44 55 666", "9999999"]
    ids_b, mask_b = nat_tok.encode_batch(texts, 32)
    for i, t in enumerate(texts):
        ids_s, mask_s = nat_tok.encode(t, 32)
        np.testing.assert_array_equal(ids_b[i], ids_s)
        np.testing.assert_array_equal(mask_b[i], mask_s)


def test_native_truncation(py_tok, nat_tok):
    long = " ".join(["12345"] * 300)
    ids_py, _ = py_tok.encode(long, 64)
    ids_c, mask_c = nat_tok.encode(long, 64)
    np.testing.assert_array_equal(ids_c, ids_py)
    assert mask_c.sum() == 64


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def test_native_is_fast(py_tok, nat_tok):
    rng = np.random.RandomState(1)
    texts = [
        " ".join(str(v) for v in rng.randint(-5000, 5000, size=55))
        for _ in range(2402)  # reference train-split scale
    ]
    # best-of-3 both sides: wall-clock under a loaded CI box is noisy, and a
    # single bad slice flips the ratio (seen once at 0.09 s native when a
    # background TPU feeder held the cores)
    dt_native = min(
        _timed(lambda: nat_tok.encode_batch(texts, 512)) for _ in range(3)
    )
    dt_py = min(
        _timed(lambda: py_tok.encode_batch(texts[:300], 512)) for _ in range(3)
    ) * (len(texts) / 300)
    assert dt_native < dt_py / 2, (dt_native, dt_py)
    assert dt_native < 2.0  # whole split comfortably sub-second unloaded


def test_native_edge_cases(py_tok, nat_tok):
    """Adversarial inputs: empty, lone signs, huge numbers, extra spaces."""
    cases = ["", "-", "- -", "  7   8  ", "0", "-0",
             "99999999999999999999", "1 " * 200, "-" * 5 + "3"]
    for t in cases:
        ids_py, mask_py = py_tok.encode(t, 64)
        ids_c, mask_c = nat_tok.encode(t, 64)
        np.testing.assert_array_equal(ids_c, ids_py, err_msg=repr(t))
        np.testing.assert_array_equal(mask_c, mask_py, err_msg=repr(t))


def test_native_fuzz_random_strings(py_tok, nat_tok):
    rng = np.random.RandomState(7)
    for _ in range(200):
        n = rng.randint(1, 40)
        parts = []
        for _ in range(n):
            v = rng.randint(-10**rng.randint(1, 9), 10**rng.randint(1, 9))
            parts.append(str(v))
        t = " ".join(parts)
        ids_py, _ = py_tok.encode(t, 128)
        ids_c, _ = nat_tok.encode(t, 128)
        np.testing.assert_array_equal(ids_c, ids_py, err_msg=t[:80])
