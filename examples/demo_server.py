"""Image-generation demo service — the gradio demo equivalent
(lumina_mgpt/demos/demo_image_generation.py).

The reference runs N GPU worker processes behind multiprocessing queues
(demo_image_generation.py:29-60). On TPU one JAX process drives the chip, so
the worker pool collapses to a single model worker thread consuming a request
queue (exactly the survey's note: "single JAX process per host; queue at the
Python layer"). Serves a minimal HTTP API:

  POST /generate {"prompt": "...", "seed": 42}  -> PNG bytes
  GET  /health                                   -> {"status": "ok", ...}

Run: python examples/demo_server.py --port 7860 [--ckpt-dir ... --vq-ckpt ...]
"""

import argparse
import io
import json
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, ".")


class ModelWorker(threading.Thread):
    """Single worker owning the TPU; requests are serialized through a queue
    (the reference's request/response mp.Queue pair, but in-process)."""

    def __init__(self, sample_fn):
        super().__init__(daemon=True)
        self.sample_fn = sample_fn
        self.requests: queue.Queue = queue.Queue()
        self.ready = threading.Event()

    def run(self):
        self.ready.set()
        while True:
            prompt, seed, reply = self.requests.get()
            try:
                t0 = time.time()
                img = self.sample_fn(prompt, seed)
                reply.put(("ok", img, time.time() - t0))
            except Exception as e:  # noqa: BLE001
                reply.put(("error", str(e), 0.0))

    def generate(self, prompt: str, seed: int):
        reply: queue.Queue = queue.Queue()
        self.requests.put((prompt, seed, reply))
        return reply.get()


def make_handler(worker: ModelWorker, stats: dict):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/health":
                body = json.dumps({"status": "ok", **stats}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path != "/generate":
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            status, img, dt = worker.generate(
                req.get("prompt", ""), int(req.get("seed", 42))
            )
            if status != "ok":
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": img}).encode())
                return
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            stats["served"] = stats.get("served", 0) + 1
            stats["last_latency_s"] = round(dt, 2)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(buf.getvalue())

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--model", default="llamagen")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--vq-ckpt", default=None)
    ap.add_argument("--target-size", type=int, default=768)
    ap.add_argument("--gpt-model", default="GPT-B")
    ap.add_argument("--latent-size", type=int, default=8)
    args = ap.parse_args()

    from sjd_tpu.loader import load_pretrained_model

    kwargs = {}
    if "lumina" in args.model:
        kwargs = dict(ckpt_dir=args.ckpt_dir, vq_ckpt=args.vq_ckpt,
                      target_size=args.target_size)
    elif "llamagen" in args.model:
        kwargs = dict(gpt_ckpt=args.ckpt_dir, vq_ckpt=args.vq_ckpt,
                      name=args.gpt_model, latent_size=args.latent_size)
    model = load_pretrained_model(args.model, **kwargs)

    def sample(prompt, seed):
        return model.sample_fn(prompt, seed)

    worker = ModelWorker(sample)
    worker.start()
    worker.ready.wait()

    stats = {"model": model.name}
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(worker, stats))
    print(f"serving {model.name} on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
