"""Demo server: HTTP chat flow, moderation hook, rotating logger,
latency stats (ref video_chatgpt/demo/* + utils.py:16-120)."""

import json
import logging
import threading
import urllib.request

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    import imageio.v3 as iio

    from stair_tpu.serve.demo import ChatBackend, LatencyTracker, make_handler

    tmp = tmp_path_factory.mktemp("serve")
    rng = np.random.RandomState(0)
    clip = (rng.rand(8, 48, 64, 3) * 255).astype(np.uint8)
    video = str(tmp / "v.gif")
    iio.imwrite(video, clip, loop=0)

    backend = ChatBackend(num_frames=4)
    tracker = LatencyTracker()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(backend, tracker)
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield {"port": httpd.server_address[1], "video": video}
    httpd.shutdown()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(), method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as resp:
        return json.loads(resp.read())


def test_chat_flow_moderation_and_stats(server, monkeypatch):
    port = server["port"]
    code, out = _post(port, "/api/new_session", {"video_path": server["video"]})
    assert code == 200 and "session_id" in out
    sid = out["session_id"]

    code, out = _post(port, "/api/chat",
                      {"session_id": sid, "message": "what did they do ?"})
    assert code == 200 and isinstance(out["reply"], str)

    # Moderation: local blocklist flags the message; the reference's
    # moderation reply comes back instead of a generation.
    monkeypatch.setenv("MODERATION_BLOCKLIST", "forbiddenword, other")
    code, out = _post(port, "/api/chat",
                      {"session_id": sid, "message": "say ForbiddenWORD now"})
    assert code == 200 and out.get("flagged") is True
    assert "MODERATION" in out["reply"]

    stats = _get(port, "/api/stats")
    assert stats["chat"]["count"] >= 1
    assert stats["chat"]["p99_ms"] >= stats["chat"]["p50_ms"] > 0

    sessions = _get(port, "/api/sessions")
    assert sid in sessions

    code, out = _post(port, "/api/chat",
                      {"session_id": "nope", "message": "x"})
    assert code == 404


def test_build_logger_rotating_file(tmp_path):
    from stair_tpu.serve import logutil

    # Reset the module-global handler so repeated test runs re-install.
    logutil._handler = None
    logger = logutil.build_logger(
        "stair_tpu.test", "t.log", log_dir=str(tmp_path),
        redirect_streams=False,
    )
    logger.info("hello rotating")
    for h in logging.getLogger().handlers:
        h.flush()
    content = (tmp_path / "t.log").read_text()
    assert "hello rotating" in content
    assert "| INFO |" in content
    # Detach so later tests don't write into tmp_path.
    root = logging.getLogger()
    if logutil._handler is not None:
        for item in list(logging.root.manager.loggerDict.values()):
            if isinstance(item, logging.Logger):
                item.removeHandler(logutil._handler)
        root.removeHandler(logutil._handler)
        logutil._handler = None


def test_violates_moderation_fail_open(monkeypatch):
    from stair_tpu.serve.logutil import violates_moderation

    monkeypatch.delenv("MODERATION_BLOCKLIST", raising=False)
    monkeypatch.delenv("MODERATION_API_URL", raising=False)
    assert violates_moderation("anything at all") is False
    # Unreachable endpoint -> fail open, like the reference's
    # RequestException/KeyError handlers (utils.py:113-118).
    monkeypatch.setenv("MODERATION_API_URL", "http://127.0.0.1:1/x")
    assert violates_moderation("anything") is False
