"""Vectorized hashing: determinism, distribution, edge cases."""

import numpy as np
import pyarrow as pa

from q_digest_ray.functions.hashing import hash64, hash_columns, splitmix64


def test_deterministic_across_calls():
    arr = pa.array(["abc", "def", "", "abc", None, "longer string here"])
    h1 = hash64(arr)
    h2 = hash64(arr)
    assert np.array_equal(h1, h2)
    assert h1[0] == h1[3]  # equal strings equal hashes
    assert h1[0] != h1[1]


def test_prefix_independence():
    # rows must hash independently of their position in the buffer
    a = hash64(pa.array(["xyz"]))
    b = hash64(pa.array(["first", "second", "xyz"]))
    assert a[0] == b[2]


def test_sliced_array():
    arr = pa.array(["aa", "bb", "cc", "dd"])
    assert np.array_equal(hash64(arr)[1:3], hash64(arr.slice(1, 2)))


def test_empty_and_null_distinct():
    h = hash64(pa.array(["", None, "x"]))
    assert h[0] != h[1]


def test_trailing_bytes_matter():
    h = hash64(pa.array(["a", "a\x00", "a\x00\x00"]))
    assert len(set(h.tolist())) == 3


def test_binary_and_large_types():
    vals = [b"\x01\x02", b"", b"\xff" * 100]
    h1 = hash64(pa.array(vals, type=pa.binary()))
    h2 = hash64(pa.array(vals, type=pa.large_binary()))
    assert np.array_equal(h1, h2)
    s1 = hash64(pa.array(["q", "rs"], type=pa.string()))
    s2 = hash64(pa.array(["q", "rs"], type=pa.large_string()))
    assert np.array_equal(s1, s2)


def test_integers_and_timestamps():
    h = hash64(pa.array([1, 2, 3], type=pa.int64()))
    assert len(set(h.tolist())) == 3
    assert np.array_equal(h, hash64(np.array([1, 2, 3], dtype=np.int64)))
    ts = pa.array([1_000_000, 2_000_000], type=pa.timestamp("us"))
    assert len(set(hash64(ts).tolist())) == 2


def test_seed_changes_hashes():
    arr = pa.array(["a", "b"])
    assert not np.array_equal(hash64(arr), hash64(arr, seed=1))


def test_distribution_quality():
    # low collision rate + uniform high bits (HLL/CMS depend on this)
    arr = pa.array([f"url-{i}" for i in range(100_000)])
    h = hash64(arr)
    assert len(np.unique(h)) == 100_000  # no collisions at 1e5 scale
    buckets = (h >> np.uint64(52)).astype(np.int64)  # top 12 bits
    counts = np.bincount(buckets, minlength=4096)
    assert counts.std() / counts.mean() < 0.35


def test_hash_columns_combines():
    t = pa.table({"a": ["x", "x"], "b": [1, 2]})
    h = hash_columns(t, ["a", "b"])
    assert h[0] != h[1]
    t2 = pa.table({"a": ["x", "x"], "b": [1, 2]})
    assert np.array_equal(h, hash_columns(t2, ["a", "b"]))


def test_splitmix_avalanche():
    x = np.arange(1000, dtype=np.uint64)
    y = splitmix64(x)
    assert len(np.unique(y)) == 1000


def test_content_key128_wordwise_properties():
    """Word-wise dual content key: equal-text => equal-key, null/empty
    distinction, sliced-array + cross-batch stability, no padding alias,
    family independence."""
    import numpy as np
    import pyarrow as pa

    from q_digest_ray.functions.hashing import content_key128

    arr = pa.array(["", "a", None, "hello world", "éü", "a" * 10000, "b", None, "a"])
    h1, h2, b = content_key128(arr, 7)
    assert h1[1] == h1[8] and h2[1] == h2[8]
    assert h1[2] == h1[7] and h2[2] == h2[7] and h1[2] != h1[0]
    assert len({(h1[i], h2[i]) for i in (0, 1, 3, 4, 5, 6)}) == 6
    s = arr.slice(3, 4)
    sh1, sh2, _ = content_key128(s, 7)
    assert (sh1 == h1[3:7]).all() and (sh2 == h2[3:7]).all()
    a1, a2, _ = content_key128(pa.array(["hello world", "a" * 10000]), 7)
    assert a1[0] == h1[3] and a2[1] == h2[5]
    assert (h1 != h2).all()
    p1, p2, _ = content_key128(pa.array(["abc", "abc\x00", "abc\x00\x00"]), 7)
    assert len({(p1[i], p2[i]) for i in range(3)}) == 3
    assert (b == ((h1 % 7 + 7) % 7)).all() and b.dtype == np.int32
