"""Remote tile scan (S12, mvt.cpp:699-730): URL grammar, bounds rule,
retry/backoff exhaustion, terminal statuses, gzip inflate."""

import gzip

import pandas as pd

from gdal_drivers_spark.sources.remote import URL_RE, fetch_remote_tiles


def _reqs(spark, urls):
    return spark.createDataFrame(pd.DataFrame({"url": urls}))


def test_url_grammar_and_bounds(spark):
    """Non-matching URLs and out-of-bounds tiles are dropped (identify
    refusal mvt.cpp:654-672 + bounds mbtiles.cpp:146-152)."""
    urls = [
        "http://h/3-1-2.mvt",          # ok
        "https://h/tiles/0-0-0",       # ok, no extension
        "ftp://h/2-3-3.pbf",           # ok
        "http://h/nope",               # no z-x-y tail
        "file:///local/3-1-2.mvt",     # scheme not remote
        "http://h/2-4-0.mvt",          # x > 2^2-1
        "http://h/2-0-4.mvt",          # y > 2^2-1
    ]
    got = fetch_remote_tiles(
        _reqs(spark, urls), transport=lambda u, a: (200, b"ab")
    ).collect()
    kept = sorted((r["zoom"], r["x"], r["y"]) for r in got)
    assert kept == [(0, 0, 0), (2, 3, 3), (3, 1, 2)]
    assert all(bytes(r["tile_data"]) == b"ab" and r["status"] == 200 for r in got)


def test_transient_exhaustion_keeps_row_with_final_status(spark):
    """A URL that never stops 503ing is exhausted after max_attempts
    and recorded, not raised — a poison URL must not kill the stage."""
    got = fetch_remote_tiles(
        _reqs(spark, ["http://h/1-0-1.mvt"]),
        transport=lambda u, a: (503, b"x"),
        max_attempts=3,
        backoff_s=0.0,
    ).collect()
    (r,) = got
    assert (r["status"], r["n_attempts"]) == (503, 3)
    assert bytes(r["tile_data"]) == b""


def test_retry_then_success_counts_attempts(spark):
    calls = {"n": 0}

    def tp(url, attempt):
        return (503, b"") if attempt < 2 else (200, b"ok")

    (r,) = fetch_remote_tiles(
        _reqs(spark, ["http://h/1-1-0.mvt"]), transport=tp, backoff_s=0.0
    ).collect()
    assert (r["status"], r["n_attempts"], bytes(r["tile_data"])) == (200, 3, b"ok")


def test_terminal_status_no_retry_and_gzip_inflate(spark):
    def tp(url, attempt):
        if url.endswith("0-0.mvt"):
            return 404, b"ignored"
        return 200, gzip.compress(b"payload")

    rows = {
        (r["x"], r["y"]): r
        for r in fetch_remote_tiles(
            _reqs(spark, ["http://h/1-0-0.mvt", "http://h/1-1-1.mvt"]), transport=tp
        ).collect()
    }
    assert rows[(0, 0)]["status"] == 404
    assert rows[(0, 0)]["n_attempts"] == 1
    assert bytes(rows[(0, 0)]["tile_data"]) == b""
    assert bytes(rows[(1, 1)]["tile_data"]) == b"payload"


def test_urlre_is_anchored():
    assert URL_RE.match("http://h/a/3-1-2.mvt")
    assert not URL_RE.match("http://h/3-1-2.mvt/extra")


def test_transport_exceptions_and_corrupt_gzip_poison_only_their_rows(spark):
    """ADVICE r01: URLError-style leaks from the transport and corrupt
    gzip payloads must not kill the stage — sentinel status, empty
    payload, other rows unaffected."""
    from gdal_drivers_spark.sources.remote import fetch_remote_tiles

    def tp(url, attempt):
        if "1-0-0" in url:
            raise OSError("socket timeout")  # leaky transport
        if "1-1-0" in url:
            return 200, b"\x1f\x8b corrupt not really gzip"
        return 200, b"fine"

    reqs = spark.createDataFrame(
        [("http://t/1-0-0",), ("http://t/1-1-0",), ("http://t/1-0-1",)],
        "url string",
    )
    rows = {r.url: r for r in fetch_remote_tiles(reqs, transport=tp).collect()}
    assert rows["http://t/1-0-0"].status == 599
    assert bytes(rows["http://t/1-0-0"].tile_data) == b""
    assert rows["http://t/1-1-0"].status == -2
    assert bytes(rows["http://t/1-1-0"].tile_data) == b""
    assert rows["http://t/1-0-1"].status == 200
    assert bytes(rows["http://t/1-0-1"].tile_data) == b"fine"


def test_default_transport_ftp_statusless_response_is_success(monkeypatch):
    """ftp:// responses from urllib carry no ``status`` attribute —
    data coming back IS success for FTP (failures raise URLError);
    the reference admits ftp alongside http/https (mvt.cpp:654-672),
    so the transport maps a missing status to 200 instead of crashing
    the row into the 599 pseudo-status."""
    import io

    from gdal_drivers_spark.sources import remote

    class FakeFtpResp(io.BytesIO):  # statusless, context-managed
        pass

    monkeypatch.setattr(
        "urllib.request.urlopen",
        lambda url, timeout=30: FakeFtpResp(b"tile-bytes"),
    )
    status, payload = remote.default_transport("ftp://h/1-0-0.mvt", 0)
    assert (status, payload) == (200, b"tile-bytes")
