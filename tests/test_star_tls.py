"""Star transport unit tests: framing/demux over plain TCP and mutual
TLS with pinned self-signed certs (prod.rs:41-78, :435-515 analog —
the byte layer exercised without any protocol on top)."""

import os
import tempfile
import threading

import pytest

from zksaas_tpu.comm.star import (
    ReceivedBytes,
    StarClient,
    StarKing,
    _tls_client_ctx,
    _tls_server_ctx,
    make_self_signed_cert,
)


def _run_star(n, tls=False, drop_party=None, timeout=60.0):
    # default round timeout is generous: under xdist the box is
    # saturated with XLA compiles and a client thread can be starved
    # for tens of seconds before its send lands; only the dropout test
    # (which *wants* a timeout) passes a small value
    tls_server = tls_clients = None
    tmp = None
    if tls:
        tmp = tempfile.TemporaryDirectory()
        king_cert, king_key = make_self_signed_cert("king")
        peers = [make_self_signed_cert(f"peer{i}") for i in range(1, n)]
        kc = os.path.join(tmp.name, "king.crt")
        kk = os.path.join(tmp.name, "king.key")
        open(kc, "wb").write(king_cert)
        open(kk, "wb").write(king_key)
        peer_files = []
        for i, (c, k) in enumerate(peers, start=1):
            cf = os.path.join(tmp.name, f"p{i}.crt")
            kf = os.path.join(tmp.name, f"p{i}.key")
            open(cf, "wb").write(c)
            open(kf, "wb").write(k)
            peer_files.append((cf, kf))
        tls_server = _tls_server_ctx(kc, kk, [cf for cf, _ in peer_files])
        tls_clients = [
            _tls_client_ctx(cf, kf, kc) for cf, kf in peer_files
        ]

    king = StarKing(n, timeout=timeout, tls_ctx=tls_server)
    results = {}

    def client_main(pid):
        ctx = tls_clients[pid - 1] if tls else None
        # clients wait longer than the king's round timeout so a dropped
        # party still observes the late scatter
        c = StarClient(
            pid, ("127.0.0.1", king.port), timeout=max(10.0, 5 * timeout), tls_ctx=ctx
        )
        try:
            if pid != drop_party:
                c.send(f"id={pid}".encode(), channel=3)
            results[pid] = c.recv(channel=3)
        finally:
            c.close()

    threads = [
        threading.Thread(target=client_main, args=(i,), daemon=True)
        for i in range(1, n)
    ]
    for t in threads:
        t.start()
    # generous bring-up bound: under xdist the suite saturates every
    # core with XLA compiles and TLS handshakes can take minutes of
    # wall clock (observed flake at 20 s)
    king.accept_all(accept_timeout=300.0)
    rb = king.gather(b"id=0", channel=3, threshold=2)
    total = sum(
        int(s.decode().split("=")[1]) for s in rb.shares if s is not None
    )
    king.scatter([None] + [str(total).encode()] * (n - 1), channel=3)
    for t in threads:
        t.join(timeout=120)
    king.close()
    if tmp:
        tmp.cleanup()
    return rb, results


def test_star_plain_add_ids():
    """add_ids example semantics (mpc-net/examples/add_ids.rs): every
    party sends its id, king sums and scatters the total."""
    rb, results = _run_star(4)
    assert rb.is_full and rb.parties == (0, 1, 2, 3)
    assert all(v == b"6" for v in results.values())


def test_star_mtls_add_ids():
    rb, results = _run_star(4, tls=True)
    assert rb.is_full
    assert all(v == b"6" for v in results.values())


def test_star_dropout_partial():
    rb, results = _run_star(4, drop_party=3, timeout=2.0)
    assert not rb.is_full
    assert rb.parties == (0, 1, 2)
    # dropped party still receives the scatter
    assert results[3] == b"3"  # 0 + 1 + 2


def test_star_threshold_violation():
    with pytest.raises(TimeoutError):
        king = StarKing(2, timeout=1.0)
        t = threading.Thread(
            target=lambda: StarClient(1, ("127.0.0.1", king.port), timeout=5.0),
            daemon=True,
        )
        t.start()
        king.accept_all(accept_timeout=10.0)
        try:
            king.gather(b"x", channel=1, threshold=2)  # client sends nothing
        finally:
            king.close()
