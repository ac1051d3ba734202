"""External-VLM captioner adapters (fake-VLM subprocess/HTTP workers) and
the FGID caption stage producing the reference's JSON fields
(data/FGID_caption.py:36-116)."""
import json
import os
import sys
import textwrap

import numpy as np
import pytest
from PIL import Image

from consistentid_tpu.conditioning.captioner import (CAPTION_PROMPT,
                                                     DETAIL_PROMPT,
                                                     HTTPCaptioner,
                                                     SubprocessCaptioner,
                                                     TemplateCaptioner,
                                                     make_captioner)

FAKE_WORKER = textwrap.dedent("""
    import json, sys, os
    for line in sys.stdin:
        req = json.loads(line)
        prompt = req["prompt"]
        if "image_path" in req:
            tag = os.path.basename(req["image_path"])
        else:
            tag = f"b64:{len(req['image_b64'])}"
        kind = "detail" if "facial features" in prompt else "caption"
        print(json.dumps({"text": f"{kind} of {tag}"}), flush=True)
""")


@pytest.fixture()
def worker_cmd(tmp_path):
    script = tmp_path / "fake_vlm.py"
    script.write_text(FAKE_WORKER)
    return [sys.executable, str(script)]


def test_subprocess_captioner_two_prompt_protocol(worker_cmd):
    with SubprocessCaptioner(worker_cmd) as cap:
        caption, detail = cap("/data/img_001.jpg")
        assert caption == "caption of img_001.jpg"
        assert detail == "detail of img_001.jpg"
        # PIL images travel as base64
        caption2, _ = cap(Image.new("RGB", (8, 8)))
        assert caption2.startswith("caption of b64:")
        # prompts are the reference's two FGID prompts
        assert "facial features" in DETAIL_PROMPT
        assert "distinguishing features" in CAPTION_PROMPT


def test_subprocess_captioner_worker_death_raises(tmp_path):
    script = tmp_path / "dies.py"
    script.write_text("import sys; sys.exit(3)")
    cap = SubprocessCaptioner([sys.executable, str(script)])
    with pytest.raises(RuntimeError, match="died"):
        cap("/x.jpg")


def test_http_captioner(worker_cmd):
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(n))
            body = json.dumps(
                {"text": f"http {req['prompt'][:6]}"}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cap = HTTPCaptioner(f"http://127.0.0.1:{srv.server_port}/")
        caption, detail = cap("/data/a.png")
        assert caption == "http Please"[:11] and caption.startswith("http ")
        assert detail.startswith("http ")
    finally:
        srv.shutdown()


def test_fgid_caption_stage_cli(tmp_path, worker_cmd):
    """`apps/fgid.py caption --captioner-cmd ...` writes the reference's
    vqa_llva / vqa_llva_more_face_detail JSON fields."""
    from consistentid_tpu.apps import fgid

    images = tmp_path / "imgs"
    images.mkdir()
    rng = np.random.RandomState(0)
    for name in ("alice.png", "bob.png"):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            images / name)
    out = tmp_path / "out"

    fgid.main(["caption", "--images", str(images), "--out", str(out),
               "--captioner-cmd",
               " ".join(worker_cmd)])

    for name in ("alice", "bob"):
        with open(out / "json" / f"{name}.json") as f:
            data = json.load(f)
        assert data["vqa_llva"] == f"caption of {name}.png"
        assert data["vqa_llva_more_face_detail"] == f"detail of {name}.png"


def test_make_captioner_default_is_template():
    cap = make_captioner()
    assert isinstance(cap, TemplateCaptioner)
    caption, detail = cap(None)
    assert caption == "a photo of a person."
    assert "one face" in detail
