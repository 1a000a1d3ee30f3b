"""Native host runtime: converters + SPSC frame ring."""

import numpy as np
import pytest

from drba_tpu.utils import native

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_bgr8_to_rgbf32_matches_numpy():
    frame = RNG.integers(0, 256, (123, 77, 3), dtype=np.uint8)
    want = frame[:, :, ::-1].astype(np.float32) / 255.0
    got = native.bgr8_to_rgbf32(frame)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


def test_rgbf32_to_bgr8_matches_numpy():
    frame = RNG.uniform(-0.1, 1.1, (64, 91, 3)).astype(np.float32)
    want = (np.clip(frame[:, :, ::-1], 0, 1) * 255.0).astype(np.uint8)
    got = native.rgbf32_to_bgr8(frame)
    np.testing.assert_array_equal(got, want)


def test_roundtrip():
    frame = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    back = native.rgbf32_to_bgr8(native.bgr8_to_rgbf32(frame))
    assert np.abs(back.astype(int) - frame.astype(int)).max() <= 1


def test_frame_ring_order_and_bounds():
    slot = 64
    ring = native.FrameRing(slot_bytes=slot, capacity=4)
    frames = [RNG.integers(0, 256, (slot,), dtype=np.uint8) for _ in range(6)]
    assert ring.push(frames[0]) == 1
    assert ring.push(frames[1]) == 1
    assert ring.push(frames[2]) == 1
    assert ring.push(frames[3]) == 1
    assert ring.push(frames[4]) == 0  # full (capacity rounded to 4)
    out = np.empty(slot, np.uint8)
    assert ring.pop(out) == slot
    np.testing.assert_array_equal(out, frames[0])
    assert ring.push(frames[4]) == 1
    for want in frames[1:5]:
        assert ring.pop(out) == slot
        np.testing.assert_array_equal(out, want)
    assert ring.pop(out) == 0  # empty but not closed
    ring.close()
    assert ring.pop(out) == -1  # closed and drained
    assert ring.push(frames[5]) == -1


def test_frame_ring_threaded():
    import threading

    slot = 1024
    ring = native.FrameRing(slot_bytes=slot, capacity=8)
    n = 200
    received = []

    def consumer():
        out = np.empty(slot, np.uint8)
        while True:
            rc = ring.pop(out)
            if rc == -1:
                break
            if rc == 0:
                continue
            received.append(out.copy())

    t = threading.Thread(target=consumer)
    t.start()
    sent = []
    for i in range(n):
        f = np.full((slot,), i % 256, np.uint8)
        while ring.push(f) != 1:
            pass
        sent.append(f)
    ring.close()
    t.join(timeout=30)
    assert len(received) == n
    for a, b in zip(received, sent):
        np.testing.assert_array_equal(a, b)


def test_bgr8_to_rgb8_flip_parity():
    import numpy as np

    from drba_tpu.utils import native

    rng = np.random.default_rng(3)
    frame = rng.integers(0, 255, (64, 96, 3), np.uint8)
    out = np.empty_like(frame)
    res = native.bgr8_to_rgb8(frame, out=out)
    assert res is out
    np.testing.assert_array_equal(out, frame[:, :, ::-1])
