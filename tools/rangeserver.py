"""Minimal Range-honoring static HTTP server over a directory.

The ONE implementation of the `Range: bytes=lo-hi` contract the public
crawl buckets expose, shared by the test suite (`tests/test_warc.py`), the
pipeline example, and the WARC scale tool — three copies previously
drifted (none supported open-ended `bytes=lo-`, for one). `honor_range=
False` simulates a misconfigured server replying 200 full-body, which the
archive opener must refuse; `truncate_first_body=N` closes the first
full-body response per path after N bytes (advertised length unchanged),
which the opener must survive by resuming with a Range request;
`range_start_skew=N` answers open-ended resume ranges (`bytes=lo-`) with
an honest 206 that starts N bytes EARLY (a misbehaving server the client
must refuse by validating Content-Range, or it splices wrong bytes);
`truncate_range_body=N` closes each 206 response after N bytes ONCE per
(path, range) — the client must re-request the remaining sub-range.

Usage::

    with serve_directory(root) as srv:
        url = f"{srv.base_url}/file.warc.gz"
        ...
        srv.log                # [(path, range_header_or_None), ...]
        srv.ranged_bytes       # bytes served via 206 responses
"""

from __future__ import annotations

import contextlib
import http.server
import os
import re
import threading


class RangeHandler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler convention
        srv = self.server
        fspath = os.path.join(srv.root, self.path.lstrip("/"))
        try:
            with open(fspath, "rb") as f:
                data = f.read()
        except OSError:
            self.send_error(404)
            return
        rng = self.headers.get("Range")
        srv.log.append((self.path, rng))
        if rng and srv.honor_range:
            m = re.fullmatch(r"bytes=(\d+)-(\d*)", rng)
            if not m or int(m.group(1)) >= len(data):
                # RFC 7233 §4.4: a 416 SHOULD carry the selected
                # representation's length — clients use it to tell
                # resume-at-EOF (total == consumed) from missing bytes
                self.send_response(416)
                self.send_header("Content-Range", f"bytes */{len(data)}")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            lo = int(m.group(1))
            if srv.range_start_skew and not m.group(2):
                # fault injection: a 206 whose Content-Range honestly says
                # it starts EARLIER than the client's resume offset — the
                # client must notice or it splices wrong bytes
                lo = max(0, lo - srv.range_start_skew)
            hi = min(int(m.group(2)) if m.group(2) else len(data) - 1,
                     len(data) - 1)
            chunk = data[lo : hi + 1]
            srv.ranged_requests += 1
            srv.ranged_bytes += len(chunk)
            self.send_response(206)
            self.send_header("Content-Range", f"bytes {lo}-{hi}/{len(data)}")
            self.send_header("Content-Length", str(len(chunk)))
            self.end_headers()
            if (
                srv.truncate_range_body is not None
                and (self.path, rng) not in srv._truncated
            ):
                # fault injection: advertise the full chunk but close the
                # connection mid-body ONCE per (path, range) — the client
                # must re-request the remaining sub-range, not fail the task
                srv._truncated.add((self.path, rng))
                self.wfile.write(chunk[: srv.truncate_range_body])
                return
            self.wfile.write(chunk)
        else:
            srv.full_requests += 1
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            if (
                srv.truncate_first_body is not None
                and self.path not in srv._truncated
            ):
                # fault injection: advertise the full length but close the
                # connection mid-body ONCE per path — the client must
                # resume with a Range request, not restart
                srv._truncated.add(self.path)
                self.wfile.write(data[: srv.truncate_first_body])
                return
            self.wfile.write(data)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@contextlib.contextmanager
def serve_directory(root, honor_range: bool = True,
                    truncate_first_body: int | None = None,
                    range_start_skew: int | None = None,
                    truncate_range_body: int | None = None):
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), RangeHandler)
    srv.root = str(root)
    srv.honor_range = honor_range
    srv.truncate_first_body = truncate_first_body
    srv.range_start_skew = range_start_skew
    srv.truncate_range_body = truncate_range_body
    srv._truncated = set()
    srv.log = []
    srv.ranged_requests = srv.ranged_bytes = srv.full_requests = 0
    srv.base_url = f"http://127.0.0.1:{srv.server_address[1]}"
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()
