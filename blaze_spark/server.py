"""HTTP server: remote expression execution over the tree dialect.

Endpoint parity with the reference server (blaze/server/server.py):

- ``GET /datashape`` — datashape of the registered dataset namespace
  (reference: server.py:403-408).
- ``GET /schema`` — Spark schema JSON per dataset (feeds the ``blaze://``
  client's schema-only leaves; no reference analogue — datashape is the
  human-facing form, this is the machine-faithful one).
- ``POST /compute`` — body ``{"expr": <tree>}`` in the ``interop`` JSON
  dialect; response ``{"data": rows, "names": columns, "datashape": str}``
  (reference compserver: server.py:578-671, response keys at 660-667).
  ``Accept: application/vnd.blaze+arrow`` negotiates an Arrow IPC stream
  response instead (the reference's serialization-format negotiation,
  serialization/__init__.py — columnar here); ``vnd.blaze+msgpack``
  requests are honored only if the module exists, ``vnd.blaze+pickle``
  is refused (arbitrary code on loads).
- ``POST /add`` — register a dataset at runtime (reference addserver:
  server.py:694-753); OFF unless ``allow_add=True``.
- opt-in request profiling — ``{"expr": ..., "profile": true}`` adds a
  ``profile`` object (parse/plan/execute/serialize/total wall seconds)
  to the JSON response, or a ``blaze:profile`` schema-metadata entry to
  an Arrow response (reference: the ``allow_profiler``/
  ``profiler_output`` cProfile-per-request gate, server.py:122-136).
  OFF unless ``allow_profiler=True``; sits behind the auth gate.

Implementation is stdlib ``http.server`` (ThreadingHTTPServer) — the
reference used Flask; the transport is incidental, the contract is the
tree dialect + response shape.

Security posture (hardening beyond the reference, per round-1 advice):

- the op whitelist of ``interop.from_tree`` bounds WHAT can run;
- the ``data`` leaf (arbitrary URI reads) is DISABLED server-side by
  default — remote trees may only reference datasets registered on the
  server by name (``symbol`` leaves).  Pass ``allow_data_uris=True`` to
  opt in (trusted networks only);
- optional shared-secret auth (``auth_token=...``): every route then
  requires ``Authorization: Bearer <token>`` and replies 401 otherwise —
  the analogue of the reference server's ``authorization`` callable
  gate (blaze/server/server.py:215-223, 'bad auth token' response) and
  its trusted/untrusted serialization split
  (blaze/server/serialization/object_hook_trusted.py).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from .core import Table
from .interop import from_tree

__all__ = ["BlazeSparkServer"]


class BlazeSparkServer:
    """Serve registered Tables over HTTP (reference Server:
    blaze/server/server.py:301-401).

    >>> srv = BlazeSparkServer({"orders": orders_table}, spark)
    >>> srv.start(port=0)      # 0 = ephemeral; srv.port has the real one
    >>> # POST {"expr": {"op": "head", "args": [{"op": "symbol",
    >>> #       "args": ["orders"]}, 5]}} to http://host:port/compute
    >>> srv.stop()
    """

    def __init__(self, datasets: dict[str, Table],
                 spark: SparkSession | None = None,
                 allow_data_uris: bool = False,
                 auth_token: str | None = None,
                 allow_add: bool = False,
                 allow_profiler: bool = False,
                 stores: dict[str, str] | None = None):
        self.datasets = dict(datasets)
        # registered counts-store namespace (r14, ROADMAP #11): name ->
        # store root.  Same posture as datasets — wire trees name
        # stores, never paths; the operator decides what is reachable.
        self.stores = dict(stores or {})
        self.spark = spark
        self.allow_data_uris = allow_data_uris
        self.auth_token = auth_token
        # per-request timing breakdown (reference opt-in profiler:
        # allow_profiler/profiler_output, blaze/server/server.py:
        # 122-136 — there a cProfile dump per request, here the
        # stage-level parse/plan/execute/serialize wall times in the
        # response).  OFF by default: timings leak schema/plan shape
        # to any caller, so it is a diagnostic the operator opts into
        # — and it sits BEHIND the auth gate like every route.
        self.allow_profiler = allow_profiler
        # POST /add registers new datasets at runtime (reference
        # addserver, blaze/server/server.py:694-753).  It makes the
        # server read caller-named URIs, so it is OFF by default — same
        # posture as allow_data_uris, opted into separately because /add
        # persists the resource into the namespace for every later client.
        self.allow_add = allow_add
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self.port: int | None = None

    # -- request handling ---------------------------------------------------
    def _datashape(self) -> str:
        inner = ", ".join(f"{name}: {t.dshape}"
                          for name, t in self.datasets.items())
        return "{" + inner + "}"

    def _schemas(self) -> dict:
        """Spark schema JSON per dataset — what the ``blaze://`` client
        uses to build schema-only local leaves (datashape is the
        human/reference-facing form; this is the machine-faithful one)."""
        return {"schemas": {name: t.df.schema.json()
                            for name, t in self.datasets.items()}}

    def _add(self, payload: dict) -> dict:
        """Register one dataset (reference addserver semantics: single-
        entry mapping, 409 on an existing name, 422 on a bad shape —
        blaze/server/server.py:694-753).  The value is a source URI (or
        ``{"source": uri, "kwargs": {...}}``) resolved through
        ``sources.data`` on the server's Spark session."""
        from .sources import data as _data

        if not isinstance(payload, dict) or not payload:
            raise ValueError("need a single-entry {name: source} mapping")
        if len(payload) > 1:
            raise ValueError(
                f"given more than one resource to add: {sorted(payload)}")
        [(name, info)] = payload.items()
        if name in self.datasets:
            raise FileExistsError(
                f"cannot add dataset named {name!r}, already exists")
        if isinstance(info, dict):
            source = info["source"]
            kwargs = info.get("kwargs", {})
        else:
            source, kwargs = info, {}
        if not isinstance(source, str):
            raise ValueError("source must be a URI string")
        t = _data(source, spark=self.spark, name=name, **kwargs)
        if not isinstance(t, Table):
            raise ValueError(f"source {source!r} did not resolve to a "
                             "table")
        self.datasets[name] = t
        return {"added": name, "datashape": t.dshape}

    def _compute_table(self, payload: dict, prof: dict | None = None):
        from time import perf_counter as tic

        if "expr" not in payload:
            raise ValueError("payload must contain 'expr'")
        t0 = tic()
        t = from_tree(payload["expr"], spark=self.spark,
                      datasets=self.datasets,
                      allow_data_uris=self.allow_data_uris,
                      stores=self.stores)
        if prof is not None:
            prof["parse_s"] = tic() - t0
            t1 = tic()
            try:  # force Catalyst analysis+optimization, timed apart
                t.df._jdf.queryExecution().optimizedPlan()
            except Exception:
                pass  # Spark Connect: no _jdf — plan time folds into execute
            prof["plan_s"] = tic() - t1
        t2 = tic()
        pdf = t.compute()
        if prof is not None:
            prof["execute_s"] = tic() - t2
        return pdf, t.dshape

    @staticmethod
    def _finish_profile(prof: dict, t_ser: float) -> dict:
        from time import perf_counter as tic

        t_req = prof.pop("__t0", None)
        prof["serialize_s"] = t_ser
        # total_s is the STAGE SUM (parse + plan + execute + serialize);
        # wall_s (r13, VERDICT r12 #3) is true wall time from request
        # receipt to profile close, so handler overhead (body read,
        # auth, JSON decode, queueing inside the handler) is the
        # difference.  The final socket write of the response is
        # necessarily excluded — the profile rides IN that write.
        prof["total_s"] = sum(prof.values())
        if t_req is not None:
            prof["wall_s"] = tic() - t_req
        return {k: round(v, 6) for k, v in prof.items()}

    def _compute(self, payload: dict, prof: dict | None = None) -> dict:
        from time import perf_counter as tic

        pdf, dshape = self._compute_table(payload, prof)
        t3 = tic()
        out = {
            "data": json.loads(pdf.to_json(orient="values",
                                           date_format="iso")),
            "names": list(pdf.columns),
            "datashape": dshape,
        }
        if prof is not None:
            out["profile"] = self._finish_profile(prof, tic() - t3)
        return out

    def _compute_arrow(self, payload: dict,
                       prof: dict | None = None) -> bytes:
        """Arrow IPC stream response: the columnar analogue of the
        reference's msgpack 'efficient data field' format
        (blaze/server/serialization/serialization.py SerializationFormat
        data_dumps — there pandas-msgpack, here the format Spark itself
        moves batches in).  Column names travel in the Arrow schema;
        the datashape rides in the schema's custom metadata."""
        import io
        from time import perf_counter as tic

        import pyarrow as pa

        pdf, dshape = self._compute_table(payload, prof)
        t3 = tic()
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        meta = {**(tbl.schema.metadata or {}),
                b"blaze:datashape": dshape.encode()}
        buf = io.BytesIO()
        if prof is None:
            tbl = tbl.replace_schema_metadata(meta)
            with pa.ipc.new_stream(buf, tbl.schema) as w:
                w.write_table(tbl)
            return buf.getvalue()
        # profiled Arrow response: the breakdown rides in the schema
        # metadata (where the datashape already travels)
        meta[b"blaze:profile"] = json.dumps(
            self._finish_profile(prof, tic() - t3)).encode()
        tbl = tbl.replace_schema_metadata(meta)
        with pa.ipc.new_stream(buf, tbl.schema) as w:
            w.write_table(tbl)
        return buf.getvalue()

    def _make_handler(server_self):  # noqa: N805 — handler factory
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test runs
                pass

            def _send(self, code: int, body: dict | str):
                raw = (json.dumps(body) if isinstance(body, dict)
                       else body).encode()
                self.send_response(code)
                self.send_header("Content-Type",
                                 "application/json"
                                 if isinstance(body, dict) else "text/plain")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            def _authorized(self) -> bool:
                """Shared-secret gate (reference authorization decorator,
                blaze/server/server.py:215-223).  Constant-time compare;
                a server with no token configured admits everything."""
                if server_self.auth_token is None:
                    return True
                import hmac

                got = self.headers.get("Authorization", "")
                # compare BYTES: compare_digest raises TypeError on
                # non-ASCII str.  http.server decodes header bytes as
                # latin-1, so re-encoding latin-1 recovers the RAW wire
                # bytes — a client sending the configured non-ASCII token
                # as UTF-8 then compares equal against the token's UTF-8
                # bytes (re-encoding the header as UTF-8 would
                # double-encode it and 401 a correct token; ADVICE r6),
                # and a hostile header 401s instead of crashing
                ok = hmac.compare_digest(
                    got.encode("latin-1", "surrogateescape"),
                    f"Bearer {server_self.auth_token}".encode("utf-8"))
                if not ok:
                    self._send(401, {"error": "bad auth token"})
                return ok

            def do_GET(self):
                if not self._authorized():
                    return
                if self.path.rstrip("/") == "/datashape":
                    self._send(200, server_self._datashape())
                elif self.path.rstrip("/") == "/schema":
                    self._send(200, server_self._schemas())
                else:
                    self._send(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if not self._authorized():
                    return
                route = self.path.rstrip("/")
                if route == "/add":
                    try:
                        if not server_self.allow_add:
                            self._send(403, {"error":
                                "dataset registration is disabled; start "
                                "the server with allow_add=True"})
                            return
                        n = int(self.headers.get("Content-Length", 0))
                        payload = json.loads(self.rfile.read(n) or b"{}")
                        self._send(200, server_self._add(payload))
                    except FileExistsError as e:
                        self._send(409, {"error": str(e)})
                    except (ValueError, KeyError) as e:
                        self._send(422, {"error": str(e)})
                    except Exception as e:
                        self._send(500, {"error":
                                         f"{type(e).__name__}: {e}"})
                    return
                if route != "/compute":
                    self._send(404, {"error": f"no route {self.path}"})
                    return
                try:
                    from time import perf_counter as tic

                    t_req = tic()  # request receipt — wall_s anchor
                    n = int(self.headers.get("Content-Length", 0))
                    ctype = (self.headers.get("Content-Type") or
                             "application/json").split(";")[0].strip()
                    if ctype not in ("application/json",
                                     "application/vnd.blaze+json", ""):
                        # reference parity: pickle/msgpack are named
                        # mimetypes there (server.py:227-247).  pickle is
                        # REFUSED by posture (arbitrary code on loads —
                        # the reference itself splits trusted/untrusted);
                        # msgpack only if the module exists in this env.
                        if ctype == "application/vnd.blaze+msgpack":
                            try:
                                import msgpack  # noqa: F401
                            except ImportError:
                                self._send(415, {"error":
                                    "msgpack not installed on this "
                                    "server; use application/json or "
                                    "Accept: application/vnd.blaze+arrow"})
                                return
                        else:
                            self._send(415, {"error":
                                f"unsupported serialization {ctype!r}; "
                                "supported: application/json (request), "
                                "Accept: application/vnd.blaze+arrow "
                                "(response data)"})
                            return
                    body = self.rfile.read(n) or b"{}"
                    if ctype == "application/vnd.blaze+msgpack":
                        import msgpack

                        payload = msgpack.unpackb(body, raw=False)
                    else:
                        payload = json.loads(body)
                    # opt-in profiling (reference allow_profiler,
                    # blaze/server/server.py:122-136): request key
                    # "profile": true; 403 unless the OPERATOR enabled
                    # it — a diagnostic, never on by default
                    profile = bool(isinstance(payload, dict)
                                   and payload.pop("profile", False))
                    if profile and not server_self.allow_profiler:
                        self._send(403, {"error":
                            "profiling is disabled; start the server "
                            "with allow_profiler=True"})
                        return
                    prof = {"__t0": t_req} if profile else None
                    accept = (self.headers.get("Accept") or "").lower()
                    if "application/vnd.blaze+arrow" in accept:
                        raw = server_self._compute_arrow(payload, prof)
                        self.send_response(200)
                        self.send_header("Content-Type",
                                         "application/vnd.blaze+arrow")
                        self.send_header("Content-Length", str(len(raw)))
                        self.end_headers()
                        self.wfile.write(raw)
                    else:
                        self._send(200, server_self._compute(payload,
                                                             prof))
                except PermissionError as e:
                    # policy rejection (data-URI leaf while disabled) —
                    # distinguishable from engine failure (ADVICE r2)
                    self._send(403, {"error": str(e)})
                except (ValueError, KeyError) as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:  # engine/Spark failure
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

        return Handler

    # -- lifecycle ------------------------------------------------------------
    def start(self, port: int = 6363, host: str = "127.0.0.1"):
        """Start serving on a daemon thread; ``port=0`` picks an ephemeral
        port (recorded on ``self.port``)."""
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self.port = self._httpd.server_address[1]
        # serve_forever's DEFAULT poll_interval is 0.5 s, and shutdown()
        # blocks until the loop's next poll notices the request — a
        # measured 0.48 s of pure sleep on every stop() (r16; every
        # wire round-trip that spins a scoped server paid it).  25 ms
        # keeps the idle selector wakeup negligible (~40/s on a daemon
        # thread that lives for one request burst) and makes stop()
        # effectively immediate.
        self._thread = threading.Thread(
            target=self._httpd.serve_forever,
            kwargs={"poll_interval": 0.025}, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
