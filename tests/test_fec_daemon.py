"""FEC erasure coding and SDRdaemon-style superframe transport tests."""

import numpy as np
import pytest

from sdrangel_tpu.io import daemon, fec


def test_gf_arithmetic():
    a = np.arange(1, 256, dtype=np.uint8)
    inv = np.array([fec.gf_inv(int(x)) for x in a], dtype=np.uint8)
    np.testing.assert_array_equal(fec.gf_mul(a, inv), np.ones(255, np.uint8))
    # distributivity spot check
    assert fec.gf_mul(np.uint8(7), np.uint8(9)) == fec.gf_mul(np.uint8(9), np.uint8(7))


@pytest.mark.parametrize("n_lost,n_fec", [(0, 4), (2, 4), (4, 4), (8, 8)])
def test_fec_recovers_lost_blocks(n_lost, n_fec):
    rng = np.random.default_rng(1)
    k, L = 32, 64
    data = rng.integers(0, 256, size=(k, L), dtype=np.uint8)
    # use a small k for test speed: encode against matching matrix
    parity = fec.fec_encode(data, n_fec)
    received = {i: data[i] for i in range(k)}
    lost = rng.choice(k, size=n_lost, replace=False)
    for i in lost:
        del received[int(i)]
    for j in range(n_fec):
        received[k + j] = parity[j]
    out = fec.fec_decode(received, k, L)
    assert out is not None
    np.testing.assert_array_equal(out, data)


def test_fec_insufficient_blocks():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=(16, 32), dtype=np.uint8)
    parity = fec.fec_encode(data, 2)
    received = {i: data[i] for i in range(10)}  # 6 lost, only 2 parity
    received[16] = parity[0]
    received[17] = parity[1]
    assert fec.fec_decode(received, 16, 32) is None


def test_superframe_roundtrip_with_loss():
    rng = np.random.default_rng(3)
    iq = rng.integers(-2000, 2000, size=(8000, 2), dtype=np.int16)
    payload = iq.astype("<i2").tobytes()
    grams = daemon.make_superframe(7, payload, n_fec=8, center_frequency=100_000_000,
                                   sample_rate=250000)
    assert len(grams) == daemon.DATA_BLOCKS + 8
    # drop 8 random datagrams (within FEC budget)
    keep = list(range(len(grams)))
    for i in sorted(rng.choice(len(grams), size=8, replace=False), reverse=True):
        del keep[i]
    asm = daemon.SuperframeAssembler()
    result = None
    for i in keep:
        out = asm.feed(grams[i])
        if out:
            result = out
    assert result is not None
    fi, got_payload, meta = result
    assert fi == 7
    assert meta["center_frequency"] == 100_000_000
    assert meta["sample_rate"] == 250000
    assert got_payload == payload
    assert asm.stats.frames_ok == 1
    assert asm.stats.blocks_recovered > 0


def test_daemon_over_real_udp():
    rx = daemon.DaemonReceiver("127.0.0.1", 0, timeout=5.0)
    tx = daemon.DaemonSender("127.0.0.1", rx.port, n_fec=4,
                             center_frequency=7_000_000, sample_rate=48000)
    rng = np.random.default_rng(4)
    iq = rng.integers(-5000, 5000, size=(4096, 2), dtype=np.int16)
    tx.send_iq(iq)
    got, meta = rx.recv_frame()
    np.testing.assert_array_equal(got[: len(iq)], iq)
    assert meta["sample_rate"] == 48000
    tx.close()
    rx.close()
