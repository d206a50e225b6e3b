"""gars server CLI app (tools/gars.py vs reference apps/gars/src/gars.jl):
flag parity, the reference's warn-and-exit validation gates, cache-load
vs config-build env paths, multi-transport startup (TCP search server +
unix socket + WebSocket bridge + REST), the readiness line, and the
blocking main loop ending on a garc kill."""

import io
import json
import logging
import os
import sys
import threading
import urllib.request

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))
import garc  # noqa: E402
import gars  # noqa: E402

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _config_path(tmp_path) -> str:
    cfg = {
        "data_loader_name": "parquet_loader",
        "data_loader_arguments": [DOCS],
        "data_sampler_name": "identity_sampler",
        "id_key": "doc_id",
        "aggregation": "mean",
        "embedders": [{"id": "embedder_1", "vectors": "bm25",
                       "embeddable_fields": ["text"]}],
        "searchers": [{"id": "searcher_1", "data_embedder": "embedder_1",
                       "score_alpha": 0.4, "score_weight": 1.0}],
    }
    p = tmp_path / "env.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def _run(argv, **kw):
    out = io.StringIO()
    rc = gars.real_main(argv, out=out, **kw)
    return rc, out.getvalue()


# ---- flag parity (gars.jl:19-52) ------------------------------------------

def test_flag_defaults_mirror_reference():
    a = gars.build_arg_parser().parse_args([])
    assert a.log_level == "info" and a.log == "stdout"
    assert a.web_socket_ip == "127.0.0.1" and a.http_ip == "0.0.0.0"
    assert a.search_server_port == 9000
    assert a.data_config is None and a.env_cache is None
    short = gars.build_arg_parser().parse_args(
        ["-d", "x.json", "-c", "cache", "-u", "/tmp/s", "-w", "9100",
         "-p", "9001", "-i", "9050", "-l", "stderr"])
    assert (short.data_config, short.env_cache) == ("x.json", "cache")
    assert (short.unix_socket, short.web_socket_port,
            short.http_port, short.search_server_port) == \
        ("/tmp/s", 9100, 9001, 9050)


def test_validation_gates_warn_and_exit_zero(caplog):
    # gars.jl:98-131 order: bad ws ip, bad http ip, no front-end,
    # no config/cache — each returns 0 without touching Spark
    with caplog.at_level(logging.WARNING, logger="gars"):
        rc, _ = _run(["-p", "9001", "--web-socket-ip", "not-an-ip"])
        assert rc == 0 and "Web-socket IP" in caplog.text
        caplog.clear()
        rc, _ = _run(["-p", "9001", "--http-ip", "999.1.2.3"])
        assert rc == 0 and "HTTP IP" in caplog.text
        caplog.clear()
        rc, _ = _run(["-d", "x.json"])
        assert rc == 0 and "UNIX-socket, WEB-socket port or HTTP" \
            in caplog.text
        caplog.clear()
        rc, _ = _run(["-p", "9001"])
        assert rc == 0 and "data configuration or cache" in caplog.text


def test_negative_io_port_defaults_like_reference(caplog):
    log = logging.getLogger("gars")
    with caplog.at_level(logging.WARNING, logger="gars"):
        assert gars.normalize_io_port(-5, log) == 9000
        assert "Defaulting to 9000" in caplog.text
    assert gars.normalize_io_port(0, log) == 0      # ephemeral stays
    assert gars.normalize_io_port(9050, log) == 9050


def test_isvalidip_is_af_inet_usable():
    # transports are AF_INET: a v6 literal must fail the gate instead
    # of passing it and crashing at bind after the env build
    assert gars.isvalidip("127.0.0.1") and gars.isvalidip("0.0.0.0")
    assert not gars.isvalidip("::1")
    assert not gars.isvalidip("localhost")
    assert not gars.isvalidip("300.0.0.1")


def test_out_of_range_ports_fail_fast(caplog):
    # -w: parse-time rejection (reference arg_type=UInt16)
    with pytest.raises(SystemExit):
        gars.build_arg_parser().parse_args(["-w", "-1"])
    with pytest.raises(SystemExit):
        gars.build_arg_parser().parse_args(["-w", "70000"])
    # -p: warn + drop the REST front-end before any env build; alone
    # it then trips the no-front-end gate
    with caplog.at_level(logging.WARNING, logger="gars"):
        rc, _ = _run(["-d", "x.json", "-p", "-1"])
        assert rc == 0 and "HTTP port value error" in caplog.text
        assert "UNIX-socket, WEB-socket port or HTTP" in caplog.text
    # -i: out-of-range normalizes to the reference default
    log = logging.getLogger("gars")
    assert gars.normalize_io_port(70000, log) == 9000


def test_logger_reconfigure_closes_old_file_handler(tmp_path):
    logfile = str(tmp_path / "gars.log")
    log = gars.build_logger(logfile, "info")
    fh = log.handlers[0]
    gars.build_logger("stdout", "info")      # reconfigure
    # the old FileHandler was closed, not just dropped (fd leak)
    assert fh.stream is None or fh.stream.closed


# ---- end-to-end: config build, all transports (one Spark env) -------------

def test_config_build_serves_all_transports(spark, tmp_path, caplog):
    sock_path = str(tmp_path / "gar.sock")
    with caplog.at_level(logging.INFO, logger="gars"):
        rc, out = _run(["-d", _config_path(tmp_path), "-i", "0",
                        "-u", sock_path, "-w", "0", "-p", "0",
                        "--http-ip", "127.0.0.1"],
                       spark=spark, block=False)
    assert not isinstance(rc, int)
    servers = rc
    try:
        # startup log: banner + describe(env) + readiness ports
        assert "~ GARAMOND ~ v" in out
        assert "Searchers ready." in caplog.text
        assert "InvertedIndex (bm25)" in caplog.text
        ready = json.loads(out.splitlines()[-1].split("gars-ready ", 1)[1])
        assert ready["search_server_port"] == servers.search.port > 0
        assert ready["unix_socket"] == sock_path
        assert ready["web_socket_port"] == servers.bridge.port > 0
        assert ready["http_port"] == servers.rest.port > 0

        # TCP search server answers a garc query
        rc2, got = _query_garc(
            ["spark join data", "--max-matches", "3",
             "--port", str(servers.search.port)])
        assert rc2 == 0
        resp = json.loads(got)
        assert len(resp["results"]) == 3
        assert resp["results"][0]["rank"] == 1

        # unix transport answers the same query identically
        rc3, got_unix = _query_garc(
            ["spark join data", "--max-matches", "3",
             "--unix-socket", sock_path])
        assert rc3 == 0 and json.loads(got_unix) == resp

        # REST transport: same request over POST /api/search
        body = json.dumps({"query": "spark join data",
                           "max_matches": 3}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{servers.rest.port}/api/search",
            data=body, headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            rest_resp = json.loads(r.read())
        assert rest_resp["results"] == resp["results"]
    finally:
        servers.shutdown()
    assert os.path.exists(sock_path) is False       # cleaned up


def _query_garc(argv):
    out = io.StringIO()
    rc = garc.real_main(argv, out=out)
    return rc, out.getvalue()


def test_partial_start_failure_leaks_no_transports(spark, tmp_path):
    # occupy a port, then ask gars for it as the REST port: the late
    # bind failure must stop the already-started search server too
    import socket as socketlib
    blocker = socketlib.socket()
    blocker.bind(("127.0.0.1", 0))
    taken = blocker.getsockname()[1]
    try:
        with pytest.raises(OSError):
            gars.real_main(["-d", _config_path(tmp_path), "-i", "0",
                            "-p", str(taken), "--http-ip", "127.0.0.1"],
                           out=io.StringIO(), spark=spark, block=False)
        # no lingering gars transport threads (Spark's own
        # AccumulatorTCPServer also runs serve_forever — exclude it)
        import time

        def _gars_server_threads():
            out = []
            for t in threading.enumerate():
                tgt = getattr(t, "_target", None)
                owner = getattr(tgt, "__self__", None)
                if owner is not None and type(owner).__module__.startswith(
                        "garamond_jl_spark"):
                    out.append(t)
            return out

        for _ in range(50):
            alive = _gars_server_threads()
            if not alive:
                break
            time.sleep(0.1)
        assert not alive
    finally:
        blocker.close()


# ---- env-cache load path + blocking loop ends on kill ---------------------

def test_cache_load_and_kill_ends_blocking_main(spark, tmp_path):
    from garamond_jl_spark.config import EngineConfig
    from garamond_jl_spark.operators.persist import build_persistent

    idx_dir = str(tmp_path / "idx")
    docs = spark.read.parquet(DOCS)
    build_persistent(spark, docs, EngineConfig(score_alpha=0.4),
                     idx_dir, id_col="doc_id", text_col="text")

    out = io.StringIO()
    done = {}

    def run():
        done["rc"] = gars.real_main(["-c", idx_dir, "-p", "0",
                                     "--http-ip", "127.0.0.1", "-i", "0"],
                                    out=out, spark=spark, block=True)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    # wait for the readiness line, then kill over the search server port
    for _ in range(600):
        if "gars-ready" in out.getvalue():
            break
        t.join(0.1)
    ready = json.loads(
        out.getvalue().splitlines()[-1].split("gars-ready ", 1)[1])
    port = ready["search_server_port"]

    # the cache-loaded env answers before the kill
    rc, got = _query_garc(["spark join data", "--max-matches", "2",
                           "--port", str(port)])
    assert rc == 0 and len(json.loads(got)["results"]) == 2

    rc_kill = garc.real_main(["--kill", "--port", str(port)],
                             out=io.StringIO())
    assert rc_kill == 0
    t.join(30)
    assert not t.is_alive() and done["rc"] == 0
