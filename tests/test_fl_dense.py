"""Dense-on-device FL encode vs the NumPy golden (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fl_rl_compression_mpi_tpu.ops import fl_dense_pallas, fl_numpy

# Heavy interpret-mode / multi-process suite: slow tier (see conftest).
pytestmark = pytest.mark.slow

R = 8  # small tiles: interpret mode


def _encode(data):
    n = data.size
    tile_bytes = R * 128 * 4
    npad = max(tile_bytes, -(-n // tile_bytes) * tile_bytes)
    buf = np.zeros(npad, np.uint8)
    buf[:n] = data
    frames = -(-n // 128)
    bits2d, dense, total, _ = fl_dense_pallas.fl_encode_dense_pallas(
        jnp.asarray(buf.view(np.uint32)), jnp.int32(frames), tile_r=R)
    return (np.asarray(bits2d).reshape(-1)[:frames],
            np.asarray(dense).view(np.uint8), int(total))


def _cases():
    g = np.random.default_rng(0)
    return [
        ("w4", g.integers(0, 16, 10_000, np.uint8)),
        ("w8", g.integers(0, 256, 9_000, np.uint8)),
        ("w1-zero", np.zeros(5_000, np.uint8)),
        ("w1-binary", g.integers(0, 2, 4_096, np.uint8)),
        ("all-widths", np.concatenate(
            [g.integers(0, 1 << b, 128).astype(np.uint8)
             for b in range(1, 9)] * 4)),
        ("tail-midword", g.integers(0, 256, 4_100, np.uint8)),
        ("tiny-tail", g.integers(0, 5, 137).astype(np.uint8)),
        ("exact-tile", np.full(R * 512, 200, np.uint8)),
        ("cross-tile", g.integers(0, 32, R * 512 * 3 + 77, np.uint8)),
        # uniform-width fast-path coverage (static routing for full
        # tiles of every width: separable masks for b ∈ {1,2,4,8}, flat
        # mask planes for b ∈ {3,5,6,7}; mixed/tail tiles take the
        # general network; per-tile alternation exercises both dispatch
        # orders)
        ("w2-uniform", g.integers(0, 4, R * 512 * 2 + 9, np.uint8)),
        ("w3-uniform", (g.integers(0, 4, R * 512 + 5) + 4).astype(
            np.uint8)),
        ("w5-uniform", (g.integers(0, 16, R * 512 * 2 + 13) + 16).astype(
            np.uint8)),
        ("w6-uniform", (g.integers(0, 32, R * 512 + 21) + 32).astype(
            np.uint8)),
        ("w7-uniform", (g.integers(0, 64, R * 512 + 3) + 64).astype(
            np.uint8)),
        ("w-alternating", np.concatenate([
            g.integers(0, 1 << b, R * 512).astype(np.uint8)
            for b in (4, 8, 1, 2, 3, 4, 5, 7, 6)])),
    ]


@pytest.mark.parametrize("name,data", _cases(), ids=[c[0] for c in _cases()])
def test_dense_stream_bit_exact(name, data):
    data = data.astype(np.uint8)
    bits, vbytes, total = _encode(data)
    bg, vg = fl_numpy.encode(data)
    np.testing.assert_array_equal(bits, bg)
    assert total * 4 >= vg.size
    np.testing.assert_array_equal(vbytes[: vg.size], vg)
    # trailing bits of the tail word are zero (the host-slice contract)
    if vg.size % 4:
        pad = 4 - vg.size % 4
        np.testing.assert_array_equal(vbytes[vg.size: vg.size + pad],
                                      np.zeros(pad, np.uint8))


def test_dist_dense_path_bit_exact(monkeypatch):
    """The per-shard dense-stream merge (no host fold) produces the same
    container as the golden, across an 8-shard mesh (interpret mode)."""
    from fl_rl_compression_mpi_tpu.ops import fl_jax
    from fl_rl_compression_mpi_tpu.parallel import dist
    monkeypatch.setattr(fl_dense_pallas, "DENSE_TILE_R", 8)
    monkeypatch.setattr(
        fl_jax, "_use_dense",
        lambda fl_len, nw: fl_len == 128 and nw % (8 * 128) == 0)
    g = np.random.default_rng(5)
    data = g.integers(0, 64, 128 * 250 + 99, np.uint8)
    mesh = dist.make_mesh()
    comp = dist.compress_fl(data, mesh, bucket_frames=32)
    bg, vg = fl_numpy.encode(data)
    np.testing.assert_array_equal(comp.bits, bg)
    np.testing.assert_array_equal(comp.values, vg)


def _dec_cases():
    g = np.random.default_rng(10)
    return [
        ("w4", g.integers(0, 16, 10_000, np.uint8)),
        ("w8", g.integers(0, 256, 9_000, np.uint8)),
        ("all-widths", np.concatenate(
            [g.integers(0, 1 << b, 128).astype(np.uint8)
             for b in range(1, 9)] * 4)),
        ("tail-midword", g.integers(0, 256, 4_100, np.uint8)),
        ("tiny", g.integers(0, 5, 137).astype(np.uint8)),
        ("cross-tile", g.integers(0, 32, 8 * 512 * 3 + 77, np.uint8)),
        ("w3-uniform", (g.integers(0, 4, 8 * 512 * 2 + 5) + 4).astype(
            np.uint8)),
        ("w5-uniform", (g.integers(0, 16, 8 * 512 + 13) + 16).astype(
            np.uint8)),
        ("w7-uniform", (g.integers(0, 64, 8 * 512 * 2 + 3) + 64).astype(
            np.uint8)),
    ]


@pytest.mark.parametrize("name,data", _dec_cases(),
                         ids=[c[0] for c in _dec_cases()])
def test_dense_decode_bit_exact(name, data):
    import jax

    data = data.astype(np.uint8)
    n = data.size
    R = 8
    bits, values = fl_numpy.encode(data)
    frames = -(-n // 128)
    rows = max(R, -(-n // (R * 512)) * R)
    grid = rows // R
    fb = np.zeros(rows * 4, np.int64)
    fb[:frames] = bits
    wper = fb.reshape(grid, -1).sum(axis=1) * 4
    woffs = np.concatenate([[0], np.cumsum(wper)[:-1]]).astype(np.int32)
    vwords = -(-values.size // 4)
    pad_rows = vwords // 128 + R + 32
    dbuf = np.zeros(pad_rows * 512, np.uint8)
    dbuf[: values.size] = values
    b2 = np.zeros((rows, 4), np.uint8)
    b2.reshape(-1)[:frames] = bits
    out = fl_dense_pallas.fl_decode_dense_pallas(
        jnp.asarray(dbuf.view(np.uint32).reshape(pad_rows, 128)),
        jnp.asarray(b2), jnp.asarray(woffs), jnp.int32(frames), tile_r=R)
    got = np.ascontiguousarray(
        np.asarray(jax.device_get(out)).reshape(-1)).view(np.uint8)[:n]
    np.testing.assert_array_equal(got, data)


def test_host_decode_dense_branch(monkeypatch):
    """fl_jax.decode's dense branch (forced on CPU) matches the golden."""
    import jax

    from fl_rl_compression_mpi_tpu.ops import fl_jax
    monkeypatch.setattr(fl_dense_pallas, "DENSE_DEC_TILE_R", 8)
    monkeypatch.setattr(
        fl_jax, "_use_dense_dec",
        lambda fl_len, nw: fl_len == 128 and nw % (8 * 128) == 0)
    g = np.random.default_rng(11)
    data = g.integers(0, 64, 128 * 300 + 55, np.uint8)
    bits, values = fl_numpy.encode(data)
    np.testing.assert_array_equal(
        fl_jax.decode(data.size, bits, values, bucket_frames=32), data)


def test_dist_ici_dense_path_bit_exact(monkeypatch):
    """The dense ICI all-gather merge (NCCL analog carrying exact
    compressed streams) produces the golden container on an 8-shard
    mesh."""
    from fl_rl_compression_mpi_tpu.ops import fl_jax
    from fl_rl_compression_mpi_tpu.parallel import dist
    monkeypatch.setattr(fl_dense_pallas, "DENSE_TILE_R", 8)
    monkeypatch.setattr(
        fl_jax, "_use_dense",
        lambda fl_len, nw: fl_len == 128 and nw % (8 * 128) == 0)
    g = np.random.default_rng(6)
    data = g.integers(0, 64, 128 * 260 + 17, np.uint8)
    mesh = dist.make_mesh()
    comp = dist.compress_fl_ici(data, mesh, bucket_frames=32)
    bg, vg = fl_numpy.encode(data)
    np.testing.assert_array_equal(comp.bits, bg)
    np.testing.assert_array_equal(comp.values, vg)


def test_dist_dense_decode_bit_exact(monkeypatch):
    """Sharded dense decode (each chip unpacks its compressed slice)
    restores the exact input across an 8-shard mesh."""
    from fl_rl_compression_mpi_tpu.ops import fl_jax
    from fl_rl_compression_mpi_tpu.parallel import dist
    monkeypatch.setattr(fl_dense_pallas, "DENSE_DEC_TILE_R", 8)
    monkeypatch.setattr(
        fl_jax, "_use_dense_dec",
        lambda fl_len, nw: fl_len == 128 and nw % (8 * 128) == 0)
    g = np.random.default_rng(8)
    data = g.integers(0, 64, 128 * 270 + 31, np.uint8)
    bits, values = fl_numpy.encode(data)
    from fl_rl_compression_mpi_tpu.container import FLCompressed
    mesh = dist.make_mesh()
    out = dist.decompress_fl(FLCompressed(bits, values, data.size), mesh,
                             bucket_frames=32)
    np.testing.assert_array_equal(out, data)


def test_device_roundtrip_with_encoder_woffs():
    """Encoder-emitted per-tile word offsets feed the decoder directly
    (the device-to-device round trip — no host offset scan)."""
    import jax

    g = np.random.default_rng(13)
    data = g.integers(0, 32, R * 512 * 4, np.uint8)   # 4 whole tiles
    words = jnp.asarray(data.view(np.uint32))
    frames = data.size // 128
    bits2d, dense, total, woffs = fl_dense_pallas.fl_encode_dense_pallas(
        words, jnp.int32(frames), tile_r=R)
    # woffs[t] must equal the decoder-side host scan of the widths
    bits = np.asarray(bits2d).reshape(-1)[:frames]
    wper = bits.astype(np.int64).reshape(words.size // (R * 128),
                                         -1).sum(axis=1) * 4
    np.testing.assert_array_equal(
        np.asarray(woffs),
        np.concatenate([[0], np.cumsum(wper)[:-1]]).astype(np.int32))
    out = fl_dense_pallas.fl_decode_dense_pallas(
        np.asarray(dense).reshape(-1, 128), bits2d, woffs,
        jnp.int32(frames), tile_r=R)
    got = np.ascontiguousarray(
        np.asarray(jax.device_get(out)).reshape(-1)).view(np.uint8)
    np.testing.assert_array_equal(got, data)


def test_uniform_masks_disable_gracefully():
    """Non-multiple-of-8 tiles must disable the static fast path, not
    crash at trace; the two-word row masks (round 4) now cover R=2048+
    — R=2048 needs 32 row slots, one more than a single i32 holds."""
    from fl_rl_compression_mpi_tpu.ops.fl_dense_pallas import (
        _odd_place_masks, _odd_unplace_masks, _uniform_place_masks,
        _uniform_unplace_masks)
    for fn in (_uniform_place_masks, _uniform_unplace_masks):
        lw, rw, slots = fn(12)
        assert slots is None
        assert rw.shape == (12, 1)
        lw, rw, slots = fn(2048)
        assert slots is not None
        assert rw.shape == (2048, 2)          # two-word row masks
        lw, rw, slots = fn(1024)
        assert slots is not None
        assert rw.shape == (1024, 1)          # still one word at 1024
    for fn in (_odd_place_masks, _odd_unplace_masks):
        fpw, slots = fn(4096)    # plane VMEM bound
        assert slots is None and fpw.shape == (4096, 128)


def test_dense_general_path_only_tile():
    """A tile size with the fast path disabled (R % 8 != 0) still
    round-trips bit-exactly through the general network."""
    import jax.numpy as jnp
    g = np.random.default_rng(7)
    data = g.integers(0, 16, 12 * 512 * 2 + 33).astype(np.uint8)
    n = data.size
    tile_bytes = 12 * 512
    npad = -(-n // tile_bytes) * tile_bytes
    buf = np.zeros(npad, np.uint8)
    buf[:n] = data
    frames = -(-n // 128)
    bits2d, dense, total, woffs = fl_dense_pallas.fl_encode_dense_pallas(
        jnp.asarray(buf.view(np.uint32)), jnp.int32(frames), tile_r=12)
    bg, vg = fl_numpy.encode(data)
    np.testing.assert_array_equal(
        np.asarray(bits2d).reshape(-1)[:frames], bg)
    np.testing.assert_array_equal(
        np.asarray(dense).view(np.uint8)[:vg.size], vg)
    out = fl_dense_pallas.fl_decode_dense_pallas(
        np.asarray(dense).reshape(-1, 128), bits2d, woffs,
        jnp.int32(frames), tile_r=12)
    np.testing.assert_array_equal(
        np.asarray(out).reshape(-1).view(np.uint8)[:n], data)


def test_dense_odd_width_uniform_at_tile12():
    """At tile_r = 12 (R % 8 != 0) the separable pow2 masks disable but
    the odd flat planes stay enabled — the asymmetric dispatch (odd
    widths fast, pow2 widths general) must still round-trip bit-exactly
    (ADVICE r2)."""
    import jax.numpy as jnp

    from fl_rl_compression_mpi_tpu.ops.fl_dense_pallas import (
        _odd_place_masks, _uniform_place_masks)
    _, _, pow2_slots = _uniform_place_masks(12)
    assert pow2_slots is None
    _, odd_slots = _odd_place_masks(12)
    assert odd_slots is not None

    g = np.random.default_rng(29)
    for lo, hi in ((4, 8), (16, 32)):          # w3 and w5 uniform streams
        data = g.integers(lo, hi, 12 * 512 * 2 + 17).astype(np.uint8)
        n = data.size
        tile_bytes = 12 * 512
        npad = -(-n // tile_bytes) * tile_bytes
        buf = np.zeros(npad, np.uint8)
        buf[:n] = data
        frames = -(-n // 128)
        bits2d, dense, total, woffs = \
            fl_dense_pallas.fl_encode_dense_pallas(
                jnp.asarray(buf.view(np.uint32)), jnp.int32(frames),
                tile_r=12)
        bg, vg = fl_numpy.encode(data)
        np.testing.assert_array_equal(
            np.asarray(bits2d).reshape(-1)[:frames], bg)
        np.testing.assert_array_equal(
            np.asarray(dense).view(np.uint8)[:vg.size], vg)
        out = fl_dense_pallas.fl_decode_dense_pallas(
            np.asarray(dense).reshape(-1, 128), bits2d, woffs,
            jnp.int32(frames), tile_r=12)
        np.testing.assert_array_equal(
            np.asarray(out).reshape(-1).view(np.uint8)[:n], data)


def test_host_dispatch_through_fl_jax(monkeypatch):
    """fl_jax.encode/decode's HOST-controlled speculative dispatch (probe
    + stripped single-width kernels + authoritative device flag, general
    fallback) must be byte-exact with the golden on every stream class,
    including the SPECULATION MISS (uniform first tile, mixed later)."""
    from fl_rl_compression_mpi_tpu.ops import fl_jax

    monkeypatch.setattr(fl_dense_pallas, "DENSE_TILE_R", 8)
    monkeypatch.setattr(fl_dense_pallas, "DENSE_DEC_TILE_R", 8)
    monkeypatch.setattr(fl_dense_pallas, "DENSE_UNIFORM_TILE_R", 8)
    monkeypatch.setattr(fl_jax, "_use_dense",
                        lambda L, nw: L == 128 and nw % 1024 == 0)
    monkeypatch.setattr(fl_jax, "_use_dense_dec", fl_jax._use_dense)

    g = np.random.default_rng(41)
    tile = 8 * 512
    cases = {
        "w1-hit": np.zeros(tile * 4, np.uint8),
        "w4-hit": g.integers(0, 16, tile * 4).astype(np.uint8),
        "w8-hit": g.integers(0, 256, tile * 3).astype(np.uint8),
        "w3-odd": (g.integers(0, 4, tile * 2) + 4).astype(np.uint8),
        "mixed": g.integers(0, 256, tile * 2).astype(np.uint8),
        # speculation miss: first two tiles uniform w4, then w8 — the
        # probe hits, the device flag fires, the general kernel re-runs
        "miss": np.concatenate([
            g.integers(0, 16, tile * 2).astype(np.uint8),
            g.integers(0, 256, tile).astype(np.uint8)]),
        # uniform with a partial tail tile (pad frames must not trip
        # the flag; probe requires a full first tile)
        "w4-tail": g.integers(0, 16, tile * 2 + 301).astype(np.uint8),
    }

    def _widths_stream(lo, hi, nbytes):
        d = g.integers(0, 256, nbytes).astype(np.uint8)
        nfr = nbytes // 128
        wf = g.integers(lo, hi + 1, nfr)
        m2 = d[: nfr * 128].reshape(nfr, 128)
        m2 &= ((1 << wf) - 1).astype(np.uint8)[:, None]
        m2[:, 0] = (1 << (wf - 1)).astype(np.uint8)
        return d

    # round-4b stream plans through the general kernel: per-frame mixed
    # widths 4..8 -> host_probe_route_plan speculates (wmin 4, fewer
    # routing rounds), verified by the kernel flag
    cases["plan-46"] = _widths_stream(4, 8, tile * 3)
    # plan speculation MISS: wide first tiles, then a width-1 frame —
    # the flag fires and the default general kernel re-runs
    pm = _widths_stream(5, 8, tile * 3)
    pm[tile * 2 + 128: tile * 2 + 256] = 1
    cases["plan-miss"] = pm
    for name, data in cases.items():
        bits, values = fl_jax.encode(data, bucket_frames=32)
        bg, vg = fl_numpy.encode(data)
        np.testing.assert_array_equal(bits, bg, err_msg=name)
        np.testing.assert_array_equal(values, vg, err_msg=name)
        out = fl_jax.decode(data.size, bits, values, bucket_frames=32)
        np.testing.assert_array_equal(out, data, err_msg=name)


def test_host_probe_uniform_b():
    g = np.random.default_rng(5)
    R = 8
    tile = R * 512
    assert fl_dense_pallas.host_probe_uniform_b(
        np.zeros(tile, np.uint8), R) == 1
    w4 = g.integers(0, 16, tile).astype(np.uint8)
    w4[::129] = 15
    assert fl_dense_pallas.host_probe_uniform_b(w4, R) == 4
    # odd widths are accepted since round 4 (stripped single-width
    # kernels with flat mask planes); mixed first tiles stay rejected
    assert fl_dense_pallas.host_probe_uniform_b(
        (g.integers(0, 4, tile) + 4).astype(np.uint8), R) == 3
    assert fl_dense_pallas.host_probe_uniform_b(
        g.integers(0, 256, tile).astype(np.uint8).reshape(-1), R) in (
            None, 8)
    # short inputs (no full first tile) are rejected
    assert fl_dense_pallas.host_probe_uniform_b(
        np.zeros(tile - 1, np.uint8), R) is None


def test_dense_uniform_kernels_direct():
    """The single-width kernels, called directly, are bit-exact and the
    encoder's flag fires exactly on violated speculation."""
    import jax.numpy as jnp
    g = np.random.default_rng(43)
    R = 8
    tile = R * 512
    for fb, lo, hi in ((1, 0, 2), (2, 0, 4), (4, 0, 16), (8, 128, 256)):
        data = g.integers(lo, hi, tile * 2).astype(np.uint8)
        data[::137] = hi - 1          # pin the width
        words = jnp.asarray(data.view(np.uint32))
        b2, dense, flag = fl_dense_pallas.fl_encode_dense_uniform_pallas(
            words, jnp.int32(data.size // 128), fb, tile_r=R)
        assert int(flag) == 0
        bg, vg = fl_numpy.encode(data)
        np.testing.assert_array_equal(np.asarray(b2).reshape(-1), bg)
        np.testing.assert_array_equal(
            np.asarray(dense).reshape(-1).view(np.uint8)[:vg.size], vg)
        out = fl_dense_pallas.fl_decode_dense_uniform_pallas(
            np.asarray(dense).reshape(-1, 128), fb, data.size // 512,
            tile_r=R)
        np.testing.assert_array_equal(
            np.asarray(out).reshape(-1).view(np.uint8), data)
    # violated speculation: w8 data through the fb=4 kernel must flag
    data = g.integers(0, 256, tile).astype(np.uint8)
    data[0] = 255
    _, _, flag = fl_dense_pallas.fl_encode_dense_uniform_pallas(
        jnp.asarray(data.view(np.uint32)), jnp.int32(data.size // 128),
        4, tile_r=R)
    assert int(flag) == 1


def test_dist_dense_uniform_sharded(monkeypatch):
    """The multi-chip globally-uniform speculation (one host probe →
    single-width shard program → flag/widths validation → general
    re-run on miss) must be byte-exact with the golden on hit, miss and
    mixed streams, both directions, across the 8-device mesh."""
    from fl_rl_compression_mpi_tpu.ops import fl_jax
    from fl_rl_compression_mpi_tpu.parallel import dist
    monkeypatch.setattr(fl_dense_pallas, "DENSE_TILE_R", 8)
    monkeypatch.setattr(fl_dense_pallas, "DENSE_DEC_TILE_R", 8)
    monkeypatch.setattr(fl_dense_pallas, "DENSE_UNIFORM_TILE_R", 8)
    monkeypatch.setattr(
        fl_jax, "_use_dense",
        lambda fl_len, nw: fl_len == 128 and nw % (8 * 128) == 0)
    monkeypatch.setattr(fl_jax, "_use_dense_dec", fl_jax._use_dense)
    g = np.random.default_rng(23)
    mesh = dist.make_mesh()
    size = 128 * 32 * 8 * 3 + 99
    cases = {
        "w4-hit": g.integers(0, 16, size).astype(np.uint8),
        "w1-hit": np.zeros(size, np.uint8),
        "mixed": g.integers(0, 256, size).astype(np.uint8),
        # probe hits on the file head, a later shard violates → the
        # per-shard flags force the general program
        "miss": np.concatenate([
            g.integers(0, 16, size // 2).astype(np.uint8),
            g.integers(0, 256, size - size // 2).astype(np.uint8)]),
    }
    for name, data in cases.items():
        comp = dist.compress_fl(data, mesh, bucket_frames=32)
        bg, vg = fl_numpy.encode(data)
        np.testing.assert_array_equal(comp.bits, bg, err_msg=name)
        np.testing.assert_array_equal(comp.values, vg, err_msg=name)
        np.testing.assert_array_equal(
            dist.decompress_fl(comp, mesh, bucket_frames=32), data,
            err_msg=name)


def test_ici_gather_moves_compressed_prefix_only(monkeypatch):
    """The ICI merge all-gathers each shard's compressed PREFIX (padded
    to the max shard's bucketed size), not the full padded dense buffer
    — the reference's max-padded-payload pattern (fl_gpu.cu:101-194),
    VERDICT r3 weak #7.  Pins both the gathered shape and bit-exactness."""
    import jax

    from fl_rl_compression_mpi_tpu.parallel import dist
    monkeypatch.setattr(fl_dense_pallas, "DENSE_TILE_R", 8)
    monkeypatch.setattr(dist, "_GATHER_ROW_BUCKET", 8)
    g = np.random.default_rng(21)
    n_dev = 4
    shard_bytes = 8 * 512 * 4                 # 32 rows per shard
    data = g.integers(0, 16, shard_bytes * n_dev, np.uint8)  # w4: ratio ~.5
    plan = dist.plan_shards(data.size, n_dev, bucket_frames=32)
    # bypass plan alignment (tiny tiles here): hand-shard exactly
    words2d = np.stack([
        data[i * shard_bytes:(i + 1) * shard_bytes].view(np.uint32)
        for i in range(n_dev)])
    nfs = jnp.asarray([shard_bytes // 128] * n_dev, jnp.int32)
    mesh = dist.make_mesh(n_dev)
    bits_g, dense_g, totals_g = dist.fl_compress_merged_dense(
        mesh, jnp.asarray(words2d), nfs)
    totals = np.asarray(jax.device_get(totals_g))
    dense_h = np.asarray(jax.device_get(dense_g))
    rows_total = (shard_bytes // 512) + fl_dense_pallas._dense_pad_rows(8)
    # shape pin: gathered words per shard = bucketed max compressed size,
    # strictly less than the full padded buffer
    wrows = -(-int(totals.max()) // (128 * 8)) * 8
    assert dense_h.shape == (n_dev, wrows * 128)
    assert wrows < rows_total, (wrows, rows_total)
    # every shard's exact compressed payload survived the prefix gather
    bits_h = np.asarray(jax.device_get(bits_g))
    for i in range(n_dev):
        bi = bits_h[i].reshape(-1)[: shard_bytes // 128]
        vsz = int(bi.astype(np.int64).sum()) * 16
        bg, vg = fl_numpy.encode(
            data[i * shard_bytes:(i + 1) * shard_bytes])
        np.testing.assert_array_equal(bi, bg)
        np.testing.assert_array_equal(
            dense_h[i, : -(-vsz // 4)].view(np.uint8)[:vsz], vg)


@pytest.mark.timeout(600)
def test_midsize_general_tiles_roundtrip():
    """General dense kernels at a mid tile size (R=64): per-frame-random
    (high-deficit) and mostly-w8 (low-deficit) streams, both bit-exact
    vs the NumPy golden, encode and decode.  (Round 4 A/B'd wide/bigger
    general tiles on chip and REFUTED them — exp48 — so R stays ≤ 256;
    this pins the mid-size configs that remain legal.)"""
    import jax

    g = np.random.default_rng(31)
    R64 = 64
    tile_bytes = R64 * 512
    for kind in ("mixed", "low-deficit"):
        n = tile_bytes * 3 + 517
        data = g.integers(0, 256, -(-n // tile_bytes) * tile_bytes
                          ).astype(np.uint8)
        nfr = -(-n // 128)
        if kind == "mixed":
            wf = g.integers(1, 9, nfr)
        else:
            wf = np.full(nfr, 8)
            wf[g.integers(0, nfr, nfr // 50)] = 7   # sparse w7 frames
        for f in range(nfr):
            lo, hi = f * 128, min((f + 1) * 128, n)
            data[lo:hi] &= np.uint8((1 << wf[f]) - 1)
            data[lo] = np.uint8(1 << (wf[f] - 1))
        data[n:] = 0
        bg, vg = fl_numpy.encode(data[:n])
        words = jnp.asarray(data.view(np.uint32))
        frames = jnp.int32(nfr)
        b2, dense, total, woffs = fl_dense_pallas.fl_encode_dense_pallas(
            words, frames, tile_r=R64)
        bits = np.asarray(jax.device_get(b2)).reshape(-1)[:nfr]
        np.testing.assert_array_equal(bits, bg)
        vbytes = np.asarray(jax.device_get(dense)).view(np.uint8)
        np.testing.assert_array_equal(vbytes[: vg.size], vg)
        # decode side at the same tile (wide markers + two-plane fill)
        out = fl_dense_pallas.fl_decode_dense_pallas(
            dense.reshape(-1, 128), b2, woffs, frames, tile_r=R64)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(out)).reshape(-1).view(
                np.uint8)[:n], data[:n])


@pytest.mark.parametrize("fb", [3, 5, 6, 7])
def test_stripped_odd_width_kernels(fb):
    """Round-4 stripped single-width kernels for ODD widths: a globally
    uniform w3/w5/w6/w7 stream dispatches the single-width BlockSpec
    pipeline (one flat mask plane) and round-trips bit-exactly."""
    import jax

    R16 = 16
    g = np.random.default_rng(40 + fb)
    n = R16 * 512 * 3 + 129
    lo, hi = 1 << (fb - 1), 1 << fb
    npad = -(-n // (R16 * 512)) * (R16 * 512)
    data = np.zeros(npad, np.uint8)
    data[:n] = g.integers(lo, hi, n).astype(np.uint8)
    data[::128] = np.uint8(hi - 1)      # pin every frame at width fb
    data[n:] = 0
    assert fl_dense_pallas.host_probe_uniform_b(data, R16) == fb
    frames = -(-n // 128)
    b2, dense, flag = fl_dense_pallas.fl_encode_dense_uniform_pallas(
        jnp.asarray(data.view(np.uint32)), jnp.int32(frames), fb,
        tile_r=R16)
    assert int(jax.device_get(flag)) == 0
    bg, vg = fl_numpy.encode(data[:n])
    bits = np.asarray(jax.device_get(b2)).reshape(-1)[:frames]
    np.testing.assert_array_equal(bits, bg)
    vbytes = np.asarray(jax.device_get(dense)).reshape(-1).view(np.uint8)
    np.testing.assert_array_equal(vbytes[: vg.size], vg)
    # single-width decode (flat-plane inverse)
    rows = npad // 512
    out = fl_dense_pallas.fl_decode_dense_uniform_pallas(
        dense.reshape(-1, LANES_TEST), fb, rows, tile_r=R16)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(out)).reshape(-1).view(np.uint8)[:n],
        data[:n])


LANES_TEST = 128


def test_host_decode_uniform_odd_dispatch(monkeypatch):
    """fl_jax.decode dispatches the stripped odd single-width decoder
    for an all-w3 widths header (forced-dense CPU run)."""
    from fl_rl_compression_mpi_tpu.ops import fl_jax
    monkeypatch.setattr(fl_dense_pallas, "DENSE_DEC_TILE_R", 8)
    monkeypatch.setattr(fl_dense_pallas, "DENSE_UNIFORM_TILE_R", 16)
    monkeypatch.setattr(
        fl_jax, "_use_dense_dec",
        lambda fl_len, nw: fl_len == 128 and nw % (8 * 128) == 0)
    calls = []
    orig = fl_dense_pallas.fl_decode_dense_uniform_pallas

    def spy(*a, **k):
        calls.append(k.get("tile_r"))
        return orig(*a, **k)

    monkeypatch.setattr(fl_dense_pallas,
                        "fl_decode_dense_uniform_pallas", spy)
    g = np.random.default_rng(55)
    n = 128 * 16 * 4 * 40 + 7
    data = (g.integers(0, 4, n) + 4).astype(np.uint8)   # all width 3
    bits, values = fl_numpy.encode(data)
    out = fl_jax.decode(n, bits, values, bucket_frames=64)
    np.testing.assert_array_equal(out, data)
    assert calls, "odd uniform decode kernel not dispatched"


def test_per_width_uniform_tile_dispatch(monkeypatch):
    """uniform_tile_r picks R=2048 for pow2 widths when the buffer
    divides (exp48 for w8; round-5 exp55: w4/w2/w1 win at 2048 with
    their multi-ref nref — see uniform_nref) and keeps the base tile
    otherwise; fl_jax.decode dispatches accordingly."""
    from fl_rl_compression_mpi_tpu.ops import fl_jax
    assert fl_dense_pallas.uniform_tile_r(8, 4096) == 2048
    assert fl_dense_pallas.uniform_tile_r(8, 3072) == 1024  # not % 2048
    assert fl_dense_pallas.uniform_tile_r(4, 4096) == 2048  # r5: mr wins
    assert fl_dense_pallas.uniform_tile_r(1, 4096) == 2048
    assert fl_dense_pallas.uniform_tile_r(3, 4096) == 2048  # exp55d
    assert fl_dense_pallas.uniform_tile_r(6, 4096) == 1024  # wash: base
    # end-to-end: small tiles so interpret mode stays fast — base 16,
    # w8 upgrades to 32 when rows divide
    monkeypatch.setattr(fl_dense_pallas, "DENSE_UNIFORM_TILE_R", 16)
    monkeypatch.setattr(
        fl_dense_pallas, "uniform_tile_r",
        lambda fb, rows=None: 32 if fb == 8 and (
            rows is None or rows % 32 == 0) else 16)
    monkeypatch.setattr(fl_dense_pallas, "DENSE_DEC_TILE_R", 8)
    monkeypatch.setattr(
        fl_jax, "_use_dense_dec",
        lambda fl_len, nw: fl_len == 128 and nw % (8 * 128) == 0)
    calls = []
    orig = fl_dense_pallas.fl_decode_dense_uniform_pallas

    def spy(*a, **k):
        calls.append(k.get("tile_r"))
        return orig(*a, **k)

    monkeypatch.setattr(fl_dense_pallas,
                        "fl_decode_dense_uniform_pallas", spy)
    # NOTE: a w8 stream no longer reaches the device decoder at all —
    # the round-5 width-8 identity fast path answers with a host
    # memcpy — so the tile-upgrade spy watches a w4 stream (the
    # monkeypatched uniform_tile_r above upgrades it to 32-row tiles).
    monkeypatch.setattr(
        fl_dense_pallas, "uniform_tile_r",
        lambda fb, rows=None: 32 if fb in (4, 8) and (
            rows is None or rows % 32 == 0) else 16)
    g = np.random.default_rng(66)
    n = 32 * 512 * 4 * 16 + 3           # rows divisible by 32
    data = (g.integers(0, 16, n) | 8).astype(np.uint8)   # width 4
    bits, values = fl_numpy.encode(data)
    out = fl_jax.decode(n, bits, values, bucket_frames=256)
    np.testing.assert_array_equal(out, data)
    assert calls and calls[0] == 32, calls
    # and the w8 identity path itself: device decoder NOT called
    calls.clear()
    data8 = g.integers(0, 256, n).astype(np.uint8)
    data8[::64] |= 128                   # every frame width 8
    bits8, values8 = fl_numpy.encode(data8)
    out8 = fl_jax.decode(n, bits8, values8, bucket_frames=256)
    np.testing.assert_array_equal(out8, data8)
    assert not calls, calls


# ---------------------------------------------------------------------------
# Round-4 stream plans: width floor + routing round bound (wmin /
# route_nbits), exact on decode, speculative-with-flag on encode.
# ---------------------------------------------------------------------------

def _mk_width_stream(rng, n, lo, hi):
    """Random stream whose frame widths are uniform in [lo, hi]."""
    npad = -(-n // (R * 512)) * (R * 512)
    data = np.zeros(npad, np.uint8)
    nfr = -(-n // 128)
    wf = rng.integers(lo, hi + 1, nfr)
    m2 = data[: nfr * 128].reshape(nfr, 128)
    m2[:] = rng.integers(0, 256, m2.shape)
    m2 &= ((1 << wf) - 1).astype(np.uint8)[:, None]
    m2[:, 0] = (1 << (wf - 1)).astype(np.uint8)
    data[n:] = 0
    return data, npad, nfr


def test_route_plan_covers_brute_force():
    """host_route_plan's per-tile-sum bound covers the brute-force
    per-group exclusive-prefix maximum, within its documented ≤7
    slack."""
    rng = np.random.default_rng(3)
    for frames in (1, 7, R * 4, R * 4 * 3 + 5):
        bits = rng.integers(1, 9, frames).astype(np.uint8)
        wmin, enb, dnb = fl_dense_pallas.host_route_plan(
            bits, frames, enc_r=R, dec_r=R)
        G = R * 16
        wg = np.repeat(bits.astype(np.int64), 4)
        grid = -(-wg.size // G)
        wp = np.full(grid * G, 8, np.int64)
        wp[: wg.size] = wg
        a = (8 - wp).reshape(grid, G)
        excl = np.cumsum(a, axis=1) - a
        maxd8 = int(excl.max())
        bound = fl_dense_pallas._max_route_dist(bits, R)
        assert maxd8 <= bound <= maxd8 + 7
        assert wmin == int(bits.min())
        assert enb == max(bound.bit_length(), 1)
        assert dnb == (bound + 1024).bit_length()


def test_quantize_plan_and_probe():
    q = fl_dense_pallas.quantize_plan
    assert q(5, 12, 15) == (4, 13)
    assert q(7, 9, 15) == (6, 9)
    assert q(1, 15, 15) == (1, None)    # not narrower -> None
    assert q(3, 14, 15) == (2, None)    # 14 rounds up to 15 -> None
    # probe: a first tile of widths >= 4 speculates a narrower plan
    rng = np.random.default_rng(9)
    data, _, _ = _mk_width_stream(rng, R * 512 * 2, 6, 8)
    wq, nq = fl_dense_pallas.host_probe_route_plan(data, tile_r=R)
    assert wq >= 4 and (nq is None or nq < (R * 128 - 1).bit_length())
    # too-small input -> no plan
    assert fl_dense_pallas.host_probe_route_plan(
        data[: R * 512 - 1], tile_r=R) == (1, None)


def test_route_plan_spec_roundtrip_bit_exact():
    """Planned encode (wmin + route_nbits) emits the exact golden bytes
    with a zero flag, and the planned decode round-trips."""
    rng = np.random.default_rng(4)
    n = R * 512 * 5 + 300
    data, npad, nfr = _mk_width_stream(rng, n, 4, 8)
    bg, vg = fl_numpy.encode(data[:n])
    wmin, enb, dnb = fl_dense_pallas.host_route_plan(
        bg, nfr, enc_r=R, dec_r=R)
    assert wmin == 4 and enb < (R * 128 - 1).bit_length()
    w = jnp.asarray(data.view(np.uint32))
    nf = jnp.int32(nfr)
    b2, dense, total, woffs, flag = fl_dense_pallas.fl_encode_dense_pallas(
        w, nf, tile_r=R, wmin=wmin, route_nbits=enb)
    assert int(flag) == 0
    np.testing.assert_array_equal(
        np.asarray(dense).view(np.uint8)[: vg.size], vg)
    out = fl_dense_pallas.fl_decode_dense_pallas(
        dense.reshape(-1, 128), b2, woffs, nf, tile_r=R,
        wmin=wmin, route_nbits=dnb)
    np.testing.assert_array_equal(
        np.asarray(out).reshape(-1).view(np.uint8)[:n], data[:n])


def test_route_plan_flag_on_violation():
    """A later tile narrower than the speculated floor — or routing
    distances past the speculated bound — must raise the flag."""
    rng = np.random.default_rng(5)
    n = R * 512 * 4
    data, npad, nfr = _mk_width_stream(rng, n, 5, 8)
    # width violation in the LAST tile
    data2 = data.copy()
    f = nfr - 3
    data2[f * 128:(f + 1) * 128] = 1
    w2 = jnp.asarray(data2.view(np.uint32))
    outs = fl_dense_pallas.fl_encode_dense_pallas(
        w2, jnp.int32(nfr), tile_r=R, wmin=5, route_nbits=None)
    assert len(outs) == 5 and int(outs[4]) == 1
    # distance violation: MIXED narrow widths (tiles non-uniform, so the
    # general network runs) under a 3-bit round budget.  An all-w1
    # stream would NOT flag: uniform tiles take the static fast branch,
    # which routes nothing — the plan is only about the general network.
    data3, _, _ = _mk_width_stream(np.random.default_rng(6), n, 1, 2)
    outs = fl_dense_pallas.fl_encode_dense_pallas(
        jnp.asarray(data3.view(np.uint32)), jnp.int32(nfr), tile_r=R,
        wmin=1, route_nbits=3)
    assert len(outs) == 5 and int(outs[4]) == 1
    # a plan that is NOT narrower than the default returns the plain
    # 4-tuple (the caller gates on narrowness)
    full = (R * 128 - 1).bit_length()
    outs = fl_dense_pallas.fl_encode_dense_pallas(
        jnp.asarray(data3.view(np.uint32)), jnp.int32(nfr), tile_r=R,
        wmin=1, route_nbits=full)
    assert len(outs) == 4


# ---------------------------------------------------------------------------
# Round-4b constant-stream fast path (verify-and-broadcast kernels).
# ---------------------------------------------------------------------------

def test_constant_kernels_roundtrip_and_golden():
    for c, nbytes in ((0, R * 512 * 3 + 301),   # zeros: tail allowed
                      (3, R * 512 * 2),          # c=3 (w2), full frames
                      (9, R * 512 * 2)):         # c=9 (w4), full frames
        fb = max(1, c.bit_length())
        npad = -(-nbytes // (R * 512)) * (R * 512)
        data = np.full(npad, c, np.uint8)
        data[nbytes:] = 0
        nfr = -(-nbytes // 128)
        bg, vg = fl_numpy.encode(data[:nbytes])
        w = jnp.asarray(data.view(np.uint32))
        b2, dense, flag = fl_dense_pallas.fl_encode_dense_constant_pallas(
            w, jnp.int32(nfr), c, fb, tile_r=R)
        assert int(flag) == 0, (c, nbytes)
        np.testing.assert_array_equal(
            np.asarray(b2).reshape(-1)[:nfr], bg)
        np.testing.assert_array_equal(
            np.ascontiguousarray(np.asarray(dense)).reshape(-1).view(
                np.uint8)[: vg.size], vg)
        out, dfl = fl_dense_pallas.fl_decode_dense_constant_pallas(
            dense, vg.size, c, fb, npad // 512, tile_r=R)
        assert int(dfl) == 0
        np.testing.assert_array_equal(
            np.asarray(out).reshape(-1).view(np.uint8)[:nbytes],
            data[:nbytes])


def test_constant_flags_fire():
    nbytes = R * 512 * 3
    data = np.full(nbytes, 3, np.uint8)
    nfr = nbytes // 128
    # encode: a later tile differs
    d2 = data.copy()
    d2[-70] = 2
    _, _, flag = fl_dense_pallas.fl_encode_dense_constant_pallas(
        jnp.asarray(d2.view(np.uint32)), jnp.int32(nfr), 3, 2, tile_r=R)
    assert int(flag) == 1
    # decode: the LAST payload byte differs (straddling-word byte mask
    # must catch it — same width class, so the widths header is still
    # uniform and the host prefix probe passes)
    bits, values = fl_numpy.encode(d2)
    assert (bits == 2).all()
    Kr = 2 * R // 8
    need = -(-(-(-values.size // 4)) // (Kr * 128)) * Kr
    dbuf = np.zeros(need * 512, np.uint8)
    dbuf[: values.size] = values
    rows = nbytes // 512
    out, dfl = fl_dense_pallas.fl_decode_dense_constant_pallas(
        jnp.asarray(dbuf.view(np.uint32).reshape(need, 128)),
        values.size, 3, 2, rows, tile_r=R)
    assert int(dfl) == 1


def test_host_probe_constant():
    probe = fl_dense_pallas.host_probe_constant
    z = np.zeros(R * 512 * 2, np.uint8)
    assert probe(z, z.size - 37, tile_r=R) == (0, 1)    # tail ok for 0
    c3 = np.full(R * 512 * 2, 3, np.uint8)
    assert probe(c3, c3.size, tile_r=R) == (3, 2)
    # nonzero constant with a partial tail frame: not speculable
    assert probe(c3, c3.size - 37, tile_r=R) is None
    # width not a fast power of two (c=5 -> w3): not speculable
    c5 = np.full(R * 512 * 2, 5, np.uint8)
    assert probe(c5, c5.size, tile_r=R) is None
    # non-constant first tile
    m = c3.copy(); m[10] = 1
    assert probe(m, m.size, tile_r=R) is None


def test_constant_dispatch_through_fl_jax(monkeypatch):
    from fl_rl_compression_mpi_tpu.ops import fl_jax

    monkeypatch.setattr(fl_dense_pallas, "DENSE_TILE_R", 8)
    monkeypatch.setattr(fl_dense_pallas, "DENSE_DEC_TILE_R", 8)
    monkeypatch.setattr(fl_dense_pallas, "DENSE_UNIFORM_TILE_R", 8)
    monkeypatch.setattr(fl_jax, "_use_dense",
                        lambda L, nw: L == 128 and nw % 1024 == 0)
    monkeypatch.setattr(fl_jax, "_use_dense_dec", fl_jax._use_dense)

    tile = 8 * 512
    cases = {
        "zeros-tail": np.zeros(tile * 3 + 301, np.uint8),
        "c3-full": np.full(tile * 2, 3, np.uint8),
        "c9-full": np.full(tile * 3, 9, np.uint8),
        # constant first tile, mismatch later: encode flag -> uniform
        # fallback (same width class keeps the stream w2-uniform)
        "c3-then-2": np.concatenate([
            np.full(tile * 2, 3, np.uint8),
            np.full(tile, 2, np.uint8)]),
        # last byte differs: the decode straddling-word check must
        # reject the constant decode and the uniform kernel must serve
        "c3-lastbyte": np.concatenate([
            np.full(tile * 2 - 1, 3, np.uint8), [np.uint8(2)]]),
    }
    for name, data in cases.items():
        bits, values = fl_jax.encode(data, bucket_frames=32)
        bg, vg = fl_numpy.encode(data)
        np.testing.assert_array_equal(bits, bg, err_msg=name)
        np.testing.assert_array_equal(values, vg, err_msg=name)
        out = fl_jax.decode(data.size, bits, values, bucket_frames=32)
        np.testing.assert_array_equal(out, data, err_msg=name)


def test_uniform_multiref_kernels_bit_exact():
    """Round-4b multi-ref uniform kernels (nref > 1): same contract as
    nref=1 — golden bytes, true widths, authoritative flag."""
    g = np.random.default_rng(77)
    Rt = 32                       # Rb = Rt/nref must stay a multiple of 8
    for fb in (1, 2, 3, 4, 5, 7):     # odd widths: round-5 flat-plane mr
        for nref in (2, 4):
            n = Rt * 512 * 3 + 301
            npad = -(-n // (Rt * 512)) * (Rt * 512)
            lo = 1 << (fb - 1) if fb > 1 else 0
            data = g.integers(lo, 1 << fb, npad).astype(np.uint8)
            data[::128] = np.uint8((1 << fb) - 1)
            data[n:] = 0
            nfr = -(-n // 128)
            bg, vg = fl_numpy.encode(data[:n])
            w = jnp.asarray(data.view(np.uint32))
            b2, dense, flag = \
                fl_dense_pallas.fl_encode_dense_uniform_pallas(
                    w, jnp.int32(nfr), fb, tile_r=Rt, nref=nref)
            assert int(flag) == 0, (fb, nref)
            np.testing.assert_array_equal(
                np.asarray(b2).reshape(-1)[:nfr], bg)
            np.testing.assert_array_equal(
                np.ascontiguousarray(np.asarray(dense)).reshape(
                    -1).view(np.uint8)[: vg.size], vg)
            out = fl_dense_pallas.fl_decode_dense_uniform_pallas(
                dense, fb, npad // 512, tile_r=Rt, nref=nref)
            np.testing.assert_array_equal(
                np.asarray(out).reshape(-1).view(np.uint8)[:n],
                data[:n])
            # flag on a mixed REAL tail (speculation contract; write
            # inside [:n] — the pad region must not trip it)
            bad = data.copy()
            bad[n - 129: n] = 255
            *_, fl2 = fl_dense_pallas.fl_encode_dense_uniform_pallas(
                jnp.asarray(bad.view(np.uint32)), jnp.int32(nfr), fb,
                tile_r=Rt, nref=nref)
            assert int(fl2) == 1, (fb, nref)


def test_uniform_nref_dispatch_table():
    """exp54/exp55 chip-tuned selection (see uniform_nref docstring):
    R=2048 engages deeper splits for pow2 widths; odd w3/w5 take
    nref=4 at 1024; w6/w7 unmeasured stay single-ref."""
    f = fl_dense_pallas.uniform_nref
    assert f(4, 2048) == 8 and f(4, 1024) == 4
    assert f(2, 2048) == 4 and f(2, 1024) == 4
    assert f(1, 2048) == 4 and f(1, 1024) == 2
    assert f(8, 2048) == 1          # identity placement
    assert f(3, 1024) == 4 and f(5, 1024) == 4
    assert f(6, 1024) == 1 and f(7, 1024) == 1   # unmeasured
    assert f(4, 8) == 1             # R/nref must stay a multiple of 8
    g = fl_dense_pallas.uniform_tile_r
    if fl_dense_pallas.DENSE_UNIFORM_TILE_R == 1024:
        assert g(4, 1 << 20) == 2048 and g(1, 1 << 20) == 2048
        assert g(3, 1 << 20) == 2048          # exp55d: odd mr wins too
        assert g(6, 1 << 20) == 1024          # w6/w7: wash, stay base
        assert g(4, 1024) == 1024             # rows must divide
