"""S6 REST transport: the reference's HTTP API over the lifecycle
engine (/root/reference/src/server/rest.jl:1-148 endpoint spec,
responses built by src/server/search.jl:135-170 — here
plans/lifecycle.response_json).

Endpoints (same routes and body keys as rest.jl's spec block):

* ``GET  /api/kill``          — stop the server (200, then shutdown)
* ``GET  /api/read-configs``  — the environment's engine config (JSON)
* ``GET  /*``                 — 501 Not Implemented
* ``POST /api/search``        — body → InternalRequest(search) → results
* ``POST /api/recommend``     — ``recommend_id`` seed → recommend op
* ``POST /api/rank``          — ``rank_ids`` list → rank op
* ``POST /api/envop``         — cmd ∈ {save, load, reindex}
* ``POST /*``                 — 501; malformed bodies → 400

Transport design: the reference splits REST frontend and search server
across two TCP ports (rest.jl:86-148 proxies to io_port); on Spark the
"search server" is the driver's SparkSession, so the transport is one
stdlib ``ThreadingHTTPServer`` in the driver process — handler threads
submit Spark actions directly (SparkSession is thread-safe; each
request is an independent job).  No third-party HTTP dependency.

Scale note: this serves the DRIVER as the query frontend — the correct
shape for a long-lived Spark application (requests fan out to
executors; the HTTP layer only carries the ≤response_size collected
rows).  Batch-heavy clients should prefer ``lifecycle.search_many``
over per-request POSTs.
"""

from __future__ import annotations

import dataclasses
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from garamond_jl_spark.plans.lifecycle import (InternalRequest, SearchEnv,
                                               response_json)

# body keys copied verbatim onto InternalRequest fields (rest.jl's
# /api/search spec); operation-specific keys are mapped explicitly
_PASSTHROUGH = (
    "query", "input_parser", "return_fields", "sort_fields",
    "sort_reverse", "search_method", "searchable_filters", "max_matches",
    "response_size", "response_page", "max_suggestions", "custom_weights",
    "ranker", "recommender", "tiebreak_round",
)


def request_from_body(body: dict, operation: str) -> InternalRequest:
    """rest.jl body → InternalRequest: the search body keys map 1:1;
    recommend carries its seed id and rank its id list through
    ``query`` (the engine-side convention of lifecycle.rank_ids /
    recommend, mirroring how the reference serializes them into the
    InternalRequest it proxies, src/server/requests.jl:4-21)."""
    req = InternalRequest(operation=operation)
    for key in _PASSTHROUGH:
        if key in body:
            setattr(req, key, body[key])
    if operation == "recommend":
        if "recommend_id" not in body:
            raise ValueError("recommend body needs 'recommend_id'")
        req.query = str(body["recommend_id"])
    elif operation == "rank":
        ids = body.get("rank_ids")
        if not isinstance(ids, list) or not ids:
            raise ValueError("rank body needs a non-empty 'rank_ids' list")
        req.query = " ".join(str(int(i)) for i in ids)
    elif operation == "search" and "query" not in body:
        raise ValueError("search body needs 'query'")
    return req


_ENV_LOCK_GUARD = threading.Lock()


def _attached_lock(env, attr: str) -> threading.Lock:
    lock = getattr(env, attr, None)
    if lock is None:
        with _ENV_LOCK_GUARD:
            lock = getattr(env, attr, None)
            if lock is None:
                lock = threading.Lock()
                setattr(env, attr, lock)
    return lock


def env_swap_lock(env: SearchEnv) -> threading.Lock:
    """Brief lock guarding the env's field swap and request snapshots:
    held for microseconds, never across a Spark job, so searches keep
    serving the OLD env while an envop rebuilds (the reference's
    publish-at-the-end channel semantics)."""
    return _attached_lock(env, "_swap_lock")


def env_lock(env: SearchEnv) -> threading.Lock:
    """ONE envop/snapshot lock PER ENV, shared by every transport
    serving it: gars starts up to three transports (TCP, unix, REST)
    over one SearchEnv, and per-transport locks would let a reindex
    through one interleave with a save through another — exactly the
    single-writer guarantee the env_operator channel provides in the
    reference.  Lazily attached to the env object itself."""
    return _attached_lock(env, "_envop_lock")


def _snapshot(env: SearchEnv) -> SearchEnv:
    """Shallow per-request copy: a handler thread reads ``env.index``
    several times across one search; snapshotting pins them all to one
    index even if a concurrent envop swaps ``env.index`` mid-request —
    the reference's semantics, where in-flight requests keep the env
    value they started with and the env_operator publishes the updated
    env for subsequent requests (src/server/search.jl:18-21,36-38).
    Taken under the SWAP lock (microseconds) so a multi-field envop
    swap can never be captured torn (new index + old searchers) —
    without stalling behind the envop WRITER lock, which is held for
    the whole rebuild."""
    with env_swap_lock(env):
        return dataclasses.replace(env)


def _configs_payload(env: SearchEnv) -> dict:
    """read_configuration_to_json analog (search.jl:103-104) — one
    definition shared by REST /api/read-configs and the socket
    transport's read_configs op."""
    cfg = dataclasses.asdict(env.index.cfg)
    cfg.update(aggregation=env.aggregation, score_weight=env.score_weight,
               n_searchers=1 + len(env.searchers))
    return cfg


def _envop(env: SearchEnv, body: dict) -> dict:
    """POST /api/envop — cmd ∈ {save, load, reindex} (rest.jl:20-26).

    * save: materialize the env's index to ``cmd_argument`` as a
      persistent index dir (operators/persist.build_persistent over the
      index's own docs, retain_content=True — reloadable by 'load').
    * load: swap ``env.index`` for the persistent index at
      ``cmd_argument`` (streaming/incremental.load_live_index, so a dir
      with delta batches/tombstones loads at its live state).
    * reindex: rebuild the index from its docs table (build_index),
      refreshing every derived stat — the '*' all-searchers semantics.
      A specific-searcher ``cmd_argument`` (rest.jl:24 allows one) is
      REJECTED rather than silently ignored: dense searchers here wrap
      precomputed embedding tables, so only the primary index is
      rebuildable.

    All three preserve the index's custom tokenizer (save records it,
    reindex re-tokenizes with it, load validates against it) — a
    rebuild with the default pipeline would silently change the
    vocabulary.  The replaced index's persisted frames are unpersisted
    after load/reindex so a long-lived serving driver doesn't
    accumulate orphaned cache blocks.

    save/reindex re-tokenize, so they need the env's docs table to
    CARRY the text column (build_index(..., carry_cols=[text]) /
    build_persistent(retain_content=True) — the reference serializes
    its in-memory corpus the same way, env.jl save path); the column is
    found via the optional body key ``text_col`` (default: 'content'
    then 'text').  A text-less env gets a 400 saying so.
    """
    cmd = body.get("cmd")
    arg = body.get("cmd_argument", "")

    def _text_col() -> str:
        cands = [body["text_col"]] if "text_col" in body \
            else ["content", "text"]
        for c in cands:
            if c in env.index.docs.columns:
                return c
        raise ValueError(
            f"envop {cmd} re-tokenizes: none of {cands} is carried in the "
            "index docs table (build with retain_content/carry_cols)")

    def _retire(old) -> None:
        # free the replaced index's cached frames (lazy-safe: Spark
        # recomputes if a plan still references them), including the
        # build-time auxiliary persists (raw postings) the index keeps
        # only a meta handle to — without this every reindex cycle
        # leaked one full tokenized-postings cache set
        aux = (old.meta or {}).get("_aux_persist", [])
        for frame in (old.postings, old.terms, *aux):
            try:
                frame.unpersist()
            except Exception:
                pass

    if cmd == "save":
        from garamond_jl_spark.operators.persist import build_persistent
        if not arg:
            raise ValueError("envop save needs 'cmd_argument' (a path)")
        # exclude the docs table's own derived stats (rebuilt by the
        # save) so the persistent doc table doesn't get duplicate
        # doclen/norm columns
        carry = [c for c in env.index.docs.columns
                 if c not in ("doc_id", "doclen", "norm")]
        build_persistent(env.spark, env.index.docs, env.index.cfg, arg,
                         id_col="doc_id", text_col=_text_col(),
                         carry_cols=carry, retain_content=True,
                         tokenizer=env.index.tokenizer)
        return {"envop": "save", "path": arg}
    if cmd == "load":
        from garamond_jl_spark.streaming.incremental import load_live_index
        if not arg:
            raise ValueError("envop load needs 'cmd_argument' (a path)")
        old = env.index
        loaded = load_live_index(env.spark, arg, tokenizer=old.tokenizer)
        with env_swap_lock(env):
            env.index = loaded
        _retire(old)
        return {"envop": "load", "path": arg,
                "n_docs": env.index.meta["n_docs"]}
    if cmd == "reindex":
        from garamond_jl_spark.operators.build import build_index
        if getattr(env, "config_path", None) and arg != "":
            # config-built env: the reference's selective reindex —
            # cmd_argument is "*" or a searcher id; config re-parsed,
            # data re-loaded, selected searcher(s) rebuilt
            # (env_operations.jl:35-64 via plans.env_config)
            from garamond_jl_spark.plans.env_config import \
                reindex_searchers
            new = reindex_searchers(env, arg)
            old = env.index
            # every config-derived field moves over (a partial copy
            # left e.g. the old suggest_metric active after a config
            # change); the swap-lock section is microseconds, so the
            # multi-field swap is untearable without stalling searches
            # behind the whole rebuild
            with env_swap_lock(env):
                env.index = new.index
                env.searchers = new.searchers
                env.score_weight = new.score_weight
                env.aggregation = new.aggregation
                env.id_key = new.id_key
                env.searcher_ids = new.searcher_ids
                env.suggest_metric = new.suggest_metric
                env.agg_ids = new.agg_ids
            if new.index is not old:
                # a SELECTIVE reindex can KEEP the primary (via _keep):
                # retiring it would unpersist the live serving caches
                _retire(old)
            return {"envop": "reindex", "searchers": arg,
                    "n_docs": env.index.meta["n_docs"]}
        if arg not in ("", "*"):
            raise ValueError(
                "per-searcher reindex needs a config-built env "
                "(build_search_env records config_path); use '*' or omit "
                "cmd_argument to rebuild the primary index")
        old = env.index
        # carry every non-derived column (incl. the text) so envops stay
        # repeatable: reindex→reindex / reindex→save must not drop text
        carry = [c for c in old.docs.columns
                 if c not in ("doc_id", "doclen", "norm")]
        rebuilt = build_index(env.spark, old.docs, old.cfg,
                              id_col="doc_id", text_col=_text_col(),
                              carry_cols=carry, tokenizer=old.tokenizer)
        with env_swap_lock(env):
            env.index = rebuilt
        _retire(old)
        return {"envop": "reindex", "n_docs": env.index.meta["n_docs"]}
    raise ValueError(f"unknown envop cmd: {cmd!r}")


class _Handler(BaseHTTPRequestHandler):
    # quiet: no per-request stderr lines from the stdlib handler
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    def _send(self, code: int, payload: str = "") -> None:
        body = payload.encode()
        self.send_response(code)
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802
        srv: RestServer = self.server.rest  # type: ignore[attr-defined]
        if self.path == "/api/kill":
            self._send(200, json.dumps({"status": "shutting down"}))
            threading.Thread(target=srv.shutdown, daemon=True).start()
        elif self.path == "/api/read-configs":
            self._send(200, json.dumps(_configs_payload(_snapshot(srv.env)),
                                       default=str))
        else:
            self._send(501)

    def do_POST(self) -> None:  # noqa: N802
        srv: RestServer = self.server.rest  # type: ignore[attr-defined]
        ops = {"/api/search": "search", "/api/recommend": "recommend",
               "/api/rank": "rank"}
        if self.path not in ops and self.path != "/api/envop":
            self._send(501)
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            if not isinstance(body, dict):
                raise ValueError("body must be a JSON object")
            if self.path == "/api/envop":
                # one writer at a time ACROSS transports (the
                # reference's env_operator channel, search.jl:18-21);
                # the response is sent AFTER releasing the lock so a
                # slow client cannot pin every other envop
                with env_lock(srv.env):
                    payload = json.dumps(_envop(srv.env, body))
                self._send(200, payload)
                return
            req = request_from_body(body, ops[self.path])
            self._send(200, response_json(_snapshot(srv.env), req))
        except Exception as e:  # malformed request / engine error → 400
            self._send(400, json.dumps({"error": str(e)}))


class RestServer:
    """A started REST transport over one :class:`SearchEnv`.

    ``port=0`` binds an ephemeral port (the bound port is in
    ``server.port`` / ``server.url``) — the test-friendly default;
    production callers pass the reference's fixed port."""

    def __init__(self, env: SearchEnv, host: str = "127.0.0.1",
                 port: int = 0):
        self.env = env
        self.envop_lock = env_lock(env)   # shared per-env (see env_lock)
        self.httpd = ThreadingHTTPServer((host, port), _Handler)
        self.httpd.rest = self  # type: ignore[attr-defined]
        self.host, self.port = self.httpd.server_address[:2]
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "RestServer":
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


def rest_server(env: SearchEnv, host: str = "127.0.0.1",
                port: int = 0) -> RestServer:
    """Start the REST transport (rest.jl:78-148 analog) and return the
    running server handle."""
    return RestServer(env, host=host, port=port).start()
