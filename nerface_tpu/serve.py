"""Persistent avatar-rendering server — the production serving surface.

The reference has no serving story: `eval_transformed_rays.py:201-290`
is a batch script that pays dataset load + model build + checkpoint
restore on every invocation and renders a fixed test split. Deploying an
avatar means answering *requests* — "render this expression under this
pose" — at interactive rates. This module keeps a resident process that
loads once, compiles once, and then renders each request through the
same jitted full-frame renderer as batch eval (`eval/renderer.py`):

- **Warm jit cache.** Every request reuses ONE compiled executable
  (static H/W/sample-count/capacity shapes), so requests after the first
  are compile-free. Measured end-to-end on the real chip (512², bf16;
  BENCH_NOTES.md "Round 5: serving latency, pipelined"): 226.8 ms/request
  steady (4.4 fps) on the fast-eval path for a client that keeps ≥2
  requests in flight — `serve_tcp` overlaps request N's render with
  N-1's readback/encode/reply; 282.0 ms synchronous `handle()`
  (641.6 ms parity); 3 concurrent clients sustain 4.29 req/s through
  the selectors loop.
- **Same quality contract as eval.** The parity renderer is the default;
  `fast_eval` (head-bbox ray skipping) is the same opt-in as the eval
  driver's, sized from the dataset's test-split bbox union.
- **Multi-chip serving.** Pass a `jax.sharding.Mesh` and each frame's
  rays shard over the data axis exactly like batch eval — serving scales
  the same way the offline path does.

Protocol: newline-delimited JSON, over stdio or TCP. One request per
line; one JSON response per line. Fields (all optional unless noted):

  {"expression": [76 floats]   — defaults to the request frame's / first
                                 test frame's expression
   "pose": 16 or 4x4 floats    — camera-to-world; same default story
   "frame": int                — take pose/expression/latent defaults
                                 from test-split frame i
   "latent_index": int         — row of the trained latent-code table
   "seed": int                 — RNG stream for stratified samples
   "maps": ["rgb_fine", ...]   — any of rgb_fine/rgb_coarse/disp/depth/
                                 acc/normals (default ["rgb_fine"])
   "fast_eval": bool           — override the server default per request.
                                 The fast path's bbox is frozen from the
                                 TEST-SPLIT poses; send false with novel
                                 poses that may leave that region
   "save": "/path/prefix"      — write <prefix><map>.png per map
   "encode": "png_base64"      — inline the maps in the response
   "cmd": "ping" | "stop"}     — health check / shutdown

Responses: {"ok": true, "frame_ms": .., "saved": [..], "maps": {..}} or
{"ok": false, "error": ".."}. A malformed request never kills the server.
"""

from __future__ import annotations

import base64
import dataclasses
import io
import json
import socket
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerface_tpu.config.flags import EvalFlags, FeatureFlags
from nerface_tpu.data.flame import load_flame_data
from nerface_tpu.eval.driver import (
    cast_to_disparity_image,
    device_cast_to_image,
    device_uint8,
)
from nerface_tpu.eval.normals import normal_map_from_depth
from nerface_tpu.eval.renderer import render_full_frame
from nerface_tpu.render.pipeline import RenderSettings

_KNOWN_MAPS = ("rgb_fine", "rgb_coarse", "disp", "depth", "acc", "normals")


# On-device uint8 quantization: the rendered maps live on the chip in
# f32 (3.1 MB for a 512² rgb frame); quantizing before readback means
# only the 786 KB uint8 frame rides the (high-latency, tunneled)
# host link. rgb/normals share the eval driver's device casts
# (`device_cast_to_image` / `device_uint8`); acc/depth are serve-only
# maps, quantized here with host-matching semantics. (disp keeps the
# host float64 normalize — the documented reference contract,
# `eval_transformed_rays.py:195-198`.)
@jax.jit
def _u8_unit(x: jnp.ndarray) -> jnp.ndarray:
    return (jnp.clip(x.astype(jnp.float32), 0.0, 1.0) * 255.0).astype(
        jnp.uint8
    )


@jax.jit
def _u8_minmax(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    lo, hi = jnp.min(x), jnp.max(x)
    return ((x - lo) / jnp.maximum(hi - lo, 1e-8) * 255.0).astype(jnp.uint8)


def _encode_png(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


class AvatarServer:
    """Resident renderer over one trained avatar checkpoint.

    Construction mirrors the eval driver's setup
    (`eval/driver.py::evaluate`): dataset metadata for intrinsics and
    defaults, model build from cfg, orbax-or-torch checkpoint restore,
    background / latent-code / index-map resolution, and the fast-eval
    bbox-union capacity when enabled.
    """

    def __init__(
        self,
        cfg,
        checkpoint: str,
        dataset=None,
        eval_flags: Optional[EvalFlags] = None,
        dtype=None,
        mesh: Optional[jax.sharding.Mesh] = None,
        log: bool = True,
    ):
        import os

        from nerface_tpu.train import checkpoint as ckpt_lib
        from nerface_tpu.train.loop import build_models_from_cfg
        from nerface_tpu.train.state import create_train_state

        self.cfg = cfg
        self.checkpoint = checkpoint
        self.dtype = dtype
        self.mesh = mesh
        self.flags = eval_flags if eval_flags is not None else EvalFlags.from_cfg(cfg)

        if dataset is None:
            dataset = load_flame_data(
                cfg.dataset.basedir,
                half_res=cfg.dataset.half_res,
                testskip=cfg.dataset.testskip,
                test=True,
                cachedir=cfg.dataset.get("cachedir"),
            )
        self.dataset = dataset
        self.H, self.W = dataset.H, dataset.W
        self.intrinsics = dataset.intrinsics

        self.model_coarse, self.model_fine = build_models_from_cfg(cfg)
        train_flags = FeatureFlags.from_cfg(cfg)
        state, _ = create_train_state(
            jax.random.PRNGKey(0), self.model_coarse, self.model_fine, cfg,
            train_flags, n_train=max(len(dataset.i_train), 1),
            background=jnp.zeros((self.H, self.W, 3)),
        )
        if os.path.isdir(checkpoint):
            state = ckpt_lib.load_checkpoint(checkpoint, state)
        else:
            state = ckpt_lib.import_torch_weights(
                state, ckpt_lib.load_torch_checkpoint(checkpoint)
            )
        self.params_coarse = state.params["coarse"]
        self.params_fine = state.params.get("fine")

        background = state.params.get("background")
        if background is None:
            background = state.fixed_background
        if self.flags.replace_background:
            background = jnp.asarray(dataset.load_background())
        if self.flags.no_background:
            background = None
        self.background = background

        self.latent_codes = state.params.get("latent_codes")
        self.idx_map = None
        if self.latent_codes is not None:
            try:
                self.idx_map = dataset.load_index_map()
            except FileNotFoundError:
                # same fallback as the eval driver (driver.py): identity
                # map, so the default pinned row resolves to idx_map[10]
                # there and here alike and served frames keep matching
                # batch eval
                if log:
                    print(
                        "WARNING: index_map.npy not found; using identity "
                        "latent-code mapping"
                    )
                n = len(dataset.poses)
                self.idx_map = np.stack([np.arange(n), np.arange(n)], axis=-1)

        self.settings = RenderSettings.from_cfg(cfg, mode="validation")
        self.fast_bbox = None
        self.occupancy = None
        if self.settings.fast_eval:
            # identical setup to the eval driver (one shared helper —
            # served frames are contractually pixel-identical to batch
            # eval); the serving caveat in render() still applies: novel
            # poses/expressions outside the test split's region should
            # send fast_eval=false
            from nerface_tpu.eval.occupancy import fast_eval_setup

            i_test = np.asarray(dataset.i_test)
            self.fast_bbox, self.settings, self.occupancy = fast_eval_setup(
                dataset,
                np.asarray(dataset.poses)[i_test],
                np.asarray(dataset.expressions)[i_test],
                self.settings, self.model_coarse, self.params_coarse,
                latent_codes=self.latent_codes, dtype=self.dtype, log=log,
            )

        # Request defaults come from the test split's first frame — the
        # same frame the eval driver renders first.
        i0 = int(np.asarray(dataset.i_test)[0]) if len(dataset.i_test) else 0
        self._default_pose = np.asarray(dataset.poses[i0])
        self._default_expression = np.asarray(dataset.expressions[i0])
        self._log = log
        self.requests_served = 0

    # ------------------------------------------------------------------
    def _frame_defaults(self, frame: Optional[int]):
        """pose / expression / latent row for test-split frame `frame`."""
        if frame is None:
            pose, expr = self._default_pose, self._default_expression
            frame = 0
        else:
            i_test = np.asarray(self.dataset.i_test)
            if not 0 <= frame < len(i_test):
                raise ValueError(
                    f"frame {frame} out of range [0, {len(i_test)})"
                )
            idx = int(i_test[frame])
            pose = np.asarray(self.dataset.poses[idx])
            expr = np.asarray(self.dataset.expressions[idx])
        # Same latent-row selection as the eval driver (driver.py:282-286):
        # the reference's pinned idx_map[10] under the default
        # fix_latent_code_index flag, per-frame rows only when unpinned —
        # so a served frame i is pixel-identical to batch eval's frame i.
        latent_index = 0
        if self.idx_map is not None:
            if self.flags.fix_latent_code_index:
                latent_index = int(
                    self.idx_map[min(10, len(self.idx_map) - 1), 1]
                )
            elif frame < len(self.idx_map) and self.idx_map[frame, 1] >= 0:
                latent_index = int(self.idx_map[frame, 1])
        return pose, expr, max(latent_index, 0)

    def render_async(
        self,
        expression=None,
        pose=None,
        frame: Optional[int] = None,
        latent_index: Optional[int] = None,
        seed: int = 0,
        maps=("rgb_fine",),
        fast_eval: Optional[bool] = None,
    ) -> Dict[str, tuple]:
        """DISPATCH half of a render: queue the jitted frame render plus
        the on-device uint8 quantizations and return un-pulled device
        arrays keyed by map name (each as ("u8"|"disp", array)). No host
        readback happens here — `finalize_maps` does the pulls — so the
        TCP loop can dispatch request N while request N-1's readback +
        PNG encode + reply ride the pipeline thread.

        `fast_eval=None` uses the server default.  The fast path's bbox,
        capacity, and (if enabled) occupancy grid are frozen from the
        dataset's TEST-SPLIT poses and expressions — a novel client pose
        that moves the head outside that union, or a novel expression
        that puts density in voxels the grid marked empty, gets those
        rays composited to background.  Clients sending novel
        poses/expressions should pass `fast_eval=False` to force the
        full-frame parity renderer for that request (compiled once,
        cached thereafter)."""
        bad = [m for m in maps if m not in _KNOWN_MAPS]
        if bad:
            raise ValueError(f"unknown maps {bad}; known: {_KNOWN_MAPS}")
        settings, bbox, occ = self.settings, self.fast_bbox, self.occupancy
        if fast_eval is not None and bool(fast_eval) != settings.fast_eval:
            if fast_eval and bbox is None:
                raise ValueError(
                    "fast_eval requested but the server was built without "
                    "it (cfg.nerf.validation.fast_eval false)"
                )
            settings = dataclasses.replace(settings, fast_eval=bool(fast_eval))
            if not fast_eval:
                bbox = None
                occ = None
        d_pose, d_expr, d_latent = self._frame_defaults(frame)
        pose = d_pose if pose is None else np.asarray(pose, np.float32).reshape(4, 4)
        expression = (
            d_expr if expression is None
            else np.asarray(expression, np.float32)
        )
        if expression.shape != d_expr.shape:
            raise ValueError(
                f"expression shape {expression.shape} != {d_expr.shape}"
            )
        latent_code = None
        if self.latent_codes is not None:
            row = d_latent if latent_index is None else int(latent_index)
            if not 0 <= row < len(self.latent_codes):
                raise ValueError(
                    f"latent_index {row} out of range "
                    f"[0, {len(self.latent_codes)})"
                )
            latent_code = self.latent_codes[row]

        out = render_full_frame(
            self.model_coarse, self.model_fine,
            self.params_coarse, self.params_fine,
            self.H, self.W, self.intrinsics, pose[:3, :4], settings,
            key=jax.random.PRNGKey(seed),
            expressions=jnp.asarray(expression),
            latent_code=latent_code,
            background=self.background,
            dtype=self.dtype,
            mesh=self.mesh,
            bbox=bbox,
            occupancy=occ,
        )
        pending: Dict[str, tuple] = {}
        for m in maps:
            if m in ("rgb_fine", "rgb_coarse"):
                src = out.get(m, out["rgb_coarse"])
                pending[m] = ("u8", device_cast_to_image(src))
            elif m == "disp":
                # disp keeps the host float64 min/max normalize (the
                # documented reference contract) — the raw float map is
                # pulled in finalize_maps
                pending[m] = ("disp", out.get("disp_fine", out["disp_coarse"]))
            elif m == "depth":
                depth = out.get("depth_fine", out["depth_coarse"])
                pending[m] = ("u8", _u8_minmax(depth))
            elif m == "acc":
                pending[m] = (
                    "u8", _u8_unit(out.get("acc_fine", out["acc_coarse"]))
                )
            elif m == "normals":
                # Same inputs as the eval driver: disparity + bg_weight
                # (`eval/driver.py` normals call).
                disp = out.get("disp_fine", out["disp_coarse"])
                normals = normal_map_from_depth(
                    disp, jnp.asarray(self.intrinsics, jnp.float32),
                    out["bg_weight"], clean=True,
                )
                pending[m] = ("u8", device_uint8(normals))
        self.requests_served += 1
        return pending

    @staticmethod
    def finalize_maps(pending: Dict[str, tuple]) -> Dict[str, np.ndarray]:
        """READBACK half: pull each dispatched map to host uint8."""
        result: Dict[str, np.ndarray] = {}
        for m, (kind, arr) in pending.items():
            if kind == "disp":
                result[m] = cast_to_disparity_image(np.asarray(arr))
            else:
                result[m] = np.asarray(arr)
        return result

    def render(self, **kwargs) -> Dict[str, np.ndarray]:
        """Render one frame synchronously; returns uint8 maps by name
        (dispatch + readback in one call — see `render_async`)."""
        return self.finalize_maps(self.render_async(**kwargs))

    # ------------------------------------------------------------------
    def handle_split(self, request: dict):
        """(response, finish): exactly one is non-None; neither raises.

        Control commands and errors answer immediately (`response`).
        Render requests return `finish` with the device work ALREADY
        DISPATCHED: calling it completes the host half — readback, PNG
        encode/save, response framing — and may run on a pipeline thread
        while the caller dispatches the next request's device work."""
        try:
            cmd = request.get("cmd")
            if cmd == "ping":
                return {
                    "ok": True, "cmd": "ping",
                    "H": self.H, "W": self.W,
                    "n_test_frames": int(len(self.dataset.i_test)),
                    "n_latent_codes": (
                        int(len(self.latent_codes))
                        if self.latent_codes is not None else 0
                    ),
                    "fast_eval": bool(self.settings.fast_eval),
                    "requests_served": self.requests_served,
                }, None
            if cmd == "stop":
                return {"ok": True, "cmd": "stop"}, None
            if cmd is not None:
                return {"ok": False, "error": f"unknown cmd {cmd!r}"}, None

            maps = tuple(request.get("maps", ("rgb_fine",)))
            t0 = time.time()
            pending = self.render_async(
                expression=request.get("expression"),
                pose=request.get("pose"),
                frame=request.get("frame"),
                latent_index=request.get("latent_index"),
                seed=int(request.get("seed", 0)),
                maps=maps,
                fast_eval=request.get("fast_eval"),
            )
        except Exception as e:  # serving loop must survive bad requests
            return {"ok": False, "error": f"{type(e).__name__}: {e}"}, None

        def finish() -> dict:
            try:
                # the pulls sync the render: the tunneled TPU backend
                # returns async futures that block_until_ready does not
                # cover, so np.asarray IS the completion point
                rendered = self.finalize_maps(pending)
                frame_ms = (time.time() - t0) * 1000.0

                response: dict = {
                    "ok": True, "frame_ms": round(frame_ms, 2)
                }
                save = request.get("save")
                if save:
                    from PIL import Image

                    saved = []
                    for name, img in rendered.items():
                        path = f"{save}{name}.png"
                        Image.fromarray(img).save(path)
                        saved.append(path)
                    response["saved"] = saved
                if request.get("encode") == "png_base64":
                    response["maps"] = {
                        name: {
                            "shape": list(img.shape),
                            "png_base64": base64.b64encode(
                                _encode_png(img)
                            ).decode("ascii"),
                        }
                        for name, img in rendered.items()
                    }
                return response
            except Exception as e:
                return {"ok": False, "error": f"{type(e).__name__}: {e}"}

        return None, finish

    def handle(self, request: dict) -> dict:
        """One request dict → one response dict (never raises)."""
        response, finish = self.handle_split(request)
        return response if finish is None else finish()

    def serve_jsonl(self, in_stream, out_stream, max_requests=None) -> int:
        """Serve newline-delimited JSON until EOF, a stop command, or
        `max_requests` requests (testing/draining bound).

        Returns the number of requests handled."""
        handled = 0
        for line in in_stream:
            line = line.strip()
            if not line:
                continue
            try:
                request = json.loads(line)
            except json.JSONDecodeError as e:
                response = {"ok": False, "error": f"bad json: {e}"}
            else:
                response = self.handle(request)
            out_stream.write(json.dumps(response) + "\n")
            out_stream.flush()
            handled += 1
            if response.get("cmd") == "stop" and response.get("ok"):
                break
            if max_requests is not None and handled >= max_requests:
                break
        return handled

    def serve_tcp(self, host: str, port: int, max_requests=None) -> int:
        """Serve the JSONL protocol over TCP, PIPELINED: the selectors
        loop dispatches each render's device work inline (`handle_split`)
        and hands the host half — readback over the tunnel, PNG
        encode/save, the socket reply — to a single pipeline thread. The
        device renders request N while the pipeline thread finishes
        request N-1, so serve overhead (130-190 ms/request of readback +
        framing, BENCH_NOTES "Serving latency") overlaps render instead
        of adding to it; concurrent clients get true overlap instead of
        serializing end-to-end.

        Ordering: the pipeline is one FIFO worker, so responses leave in
        arrival order — per-connection AND globally. In-flight work is
        bounded (backpressure blocks the accept loop past 4 queued
        requests). Per-connection failures (resets, disconnects
        mid-request) drop that connection only; a worker-side send
        failure is reaped by the loop. Returns the number of requests
        handled; `max_requests` bounds tests/draining."""
        import selectors
        import threading
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        handled = 0
        sel = selectors.DefaultSelector()
        buffers: Dict[socket.socket, bytes] = {}
        dead_lock = threading.Lock()
        dead: set = set()  # conns whose pipeline send failed

        def drop(conn):
            try:
                sel.unregister(conn)
            except (KeyError, ValueError):
                pass
            buffers.pop(conn, None)
            try:
                conn.close()
            except OSError:
                pass

        def send_job(conn, response, finish):
            """Pipeline thread: complete the host half, reply in order."""
            if finish is not None:
                response = finish()
            try:
                conn.sendall(
                    (json.dumps(response) + "\n").encode("utf-8")
                )
            except OSError as e:
                # client gone mid-response: that client only
                if self._log:
                    print(f"[serve] connection dropped: {e}", flush=True)
                with dead_lock:
                    dead.add(conn)
            return response

        pipe = ThreadPoolExecutor(max_workers=1, thread_name_prefix="serve-pipe")
        inflight: deque = deque()

        try:
            with socket.create_server((host, port)) as srv:
                srv.setblocking(False)
                sel.register(srv, selectors.EVENT_READ)
                if self._log:
                    print(
                        f"[serve] listening on {host}:{srv.getsockname()[1]}",
                        flush=True,
                    )
                stop = False
                while not stop and (
                    max_requests is None or handled < max_requests
                ):
                    events = sel.select(timeout=0.2)
                    with dead_lock:
                        reap, dead = dead, set()
                    for conn in reap:
                        drop(conn)
                    while inflight and inflight[0].done():
                        inflight.popleft()
                    for key, _ in events:
                        if key.fileobj is srv:
                            conn, _addr = srv.accept()
                            conn.setblocking(True)  # writes may be large PNGs
                            sel.register(conn, selectors.EVENT_READ)
                            buffers[conn] = b""
                            continue
                        conn = key.fileobj
                        try:
                            data = conn.recv(65536)
                        except OSError:
                            drop(conn)
                            continue
                        if not data:
                            drop(conn)
                            continue
                        buffers[conn] += data
                        while b"\n" in buffers.get(conn, b""):
                            line, buffers[conn] = buffers[conn].split(b"\n", 1)
                            line = line.strip()
                            if not line:
                                continue
                            try:
                                response, finish = self.handle_split(
                                    json.loads(line.decode("utf-8"))
                                )
                            except (
                                json.JSONDecodeError, UnicodeDecodeError
                            ) as e:
                                response, finish = (
                                    {"ok": False, "error": f"bad json: {e}"},
                                    None,
                                )
                            is_stop = (
                                finish is None
                                and response.get("cmd") == "stop"
                                and response.get("ok")
                            )
                            inflight.append(
                                pipe.submit(send_job, conn, response, finish)
                            )
                            handled += 1
                            if is_stop:
                                stop = True
                                break
                            if (
                                max_requests is not None
                                and handled >= max_requests
                            ):
                                break
                            # backpressure: bound device run-ahead + queued
                            # host pulls to a handful of requests
                            while len(inflight) > 4:
                                inflight.popleft().result()
                        if stop or (
                            max_requests is not None
                            and handled >= max_requests
                        ):
                            break
                while inflight:  # drain: every accepted request is answered
                    inflight.popleft().result()
                for conn in list(buffers):
                    drop(conn)
                sel.unregister(srv)
        finally:
            pipe.shutdown(wait=True)
            sel.close()
        return handled
