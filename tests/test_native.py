"""Native frame cache tests: build, correctness vs plain IO, prefetch
behaviour, stats."""

import numpy as np
import pytest

from lives_tpu.native import load_library, FrameCache

pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="no native toolchain")


def make_raw_stream(path, n=20, frame_size=4096):
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, frame_size, dtype=np.uint8)
              for _ in range(n)]
    with open(path, "wb") as fh:
        for f in frames:
            fh.write(f.tobytes())
    return frames


def test_cache_reads_correct_frames(tmp_path):
    p = tmp_path / "stream.raw"
    frames = make_raw_stream(p)
    fc = FrameCache(8, 4096, 2)
    assert fc.open_stream(str(p), 0, 4096, 4096, 20)
    for n in (0, 5, 19, 3):
        got = fc.get(n)
        assert got == frames[n].tobytes(), f"frame {n}"
    fc.close()


def test_prefetch_hits(tmp_path):
    p = tmp_path / "stream.raw"
    make_raw_stream(p)
    fc = FrameCache(16, 4096, 2)
    fc.open_stream(str(p), 0, 4096, 4096, 20)
    fc.request(0, 10)
    import time
    time.sleep(0.2)  # let workers fill
    for n in range(10):
        assert fc.get(n) is not None
    hits, misses = fc.stats()
    assert hits >= 8, (hits, misses)
    fc.close()


def test_eviction_beyond_capacity(tmp_path):
    p = tmp_path / "stream.raw"
    frames = make_raw_stream(p, n=20)
    fc = FrameCache(4, 4096, 1)  # tiny cache
    fc.open_stream(str(p), 0, 4096, 4096, 20)
    for n in range(20):  # sequential scan > capacity
        assert fc.get(n) == frames[n].tobytes()
    fc.close()


def test_out_of_range_times_out(tmp_path):
    p = tmp_path / "stream.raw"
    make_raw_stream(p)
    fc = FrameCache(4, 4096, 1)
    fc.open_stream(str(p), 0, 4096, 4096, 20)
    assert fc.get(99, timeout_ms=100) is None
    fc.close()


def test_y4m_decoder_uses_cache(tmp_path):
    from lives_tpu.io.decoders import write_y4m, try_decoders
    frames = []
    for i in range(12):
        y = np.full((32, 64), 16 + i * 5, np.uint8)
        u = np.full((16, 32), 128, np.uint8)
        v = np.full((16, 32), 90, np.uint8)
        frames.append((y, u, v))
    write_y4m(str(tmp_path / "c.y4m"), frames)
    cd = try_decoders(str(tmp_path / "c.y4m"))
    dec = cd.decoder
    assert dec._cache is not None, "native cache not active"
    for n in (0, 7, 11):
        lay = dec.get_frame(n)
        np.testing.assert_array_equal(np.asarray(lay.planes[0]),
                                      frames[n][0])
    hits, misses = dec._cache.stats()
    assert hits + misses >= 3
