"""gRPC serving front-end for the continuous-batching orchestrator.

TPU-native counterpart of the reference's JetStream gRPC server
(MaxText/maxengine_server.py:68-81 runs jetstream.core.server_lib on port
9000; its Orchestrator service exposes a server-streaming Decode plus
HealthCheck). Here the same orchestrator that backs the HTTP/JSON server
(infer/server.py) is exposed over gRPC with per-token streaming: the first
token is delivered as soon as prefill+insert completes, then one message per
ready token group.

grpcio-tools is not available in this image, so the message classes are
protoc-generated (infer/proto/) and the service/stub registration is wired by
hand via grpc.method_handlers_generic_handler — functionally identical to
what generated *_pb2_grpc.py files do.
"""

from __future__ import annotations

import json
import queue
from concurrent import futures

import numpy as np

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.infer.engine import Engine
from maxtext_indextts2_tpu.infer.proto import orchestrator_pb2 as pb
from maxtext_indextts2_tpu.infer.server import Orchestrator

SERVICE_NAME = "mtt.serving.Orchestrator"

# Keep streamed waveform messages well under gRPC's 4 MiB default cap.
_WAV_CHUNK_SAMPLES = 500_000  # 2 MB of f32


class OrchestratorService:
    """Servicer backing the three rpcs; holds the shared orchestrator."""

    def __init__(self, orch: Orchestrator, tts_pipeline=None):
        self.orch = orch
        self.tts_pipeline = tts_pipeline

    # -------------------------------------------------------------- Decode
    def Decode(self, request: pb.DecodeRequest, context):
        if not request.token_ids:
            yield pb.DecodeResponse(done=True, error="empty token_ids")
            return
        req = self.orch.submit(
            np.asarray(request.token_ids, np.int32),
            int(request.max_tokens) if request.max_tokens else 32,
            stream=True,
        )
        finished = False
        while not finished:
            tok = req.stream_q.get()
            chunk: list[int] = []
            if tok is None:
                finished = True
            else:
                chunk.append(tok)
                # Coalesce every already-ready token into one message: the
                # decode loop may emit several steps per dispatch.
                while True:
                    try:
                        nxt = req.stream_q.get_nowait()
                    except queue.Empty:
                        break
                    if nxt is None:
                        finished = True
                        break
                    chunk.append(nxt)
            if chunk or finished:
                yield pb.DecodeResponse(
                    token_ids=chunk, done=finished, error=req.error or ""
                )

    # ---------------------------------------------------------- Synthesize
    def Synthesize(self, request: pb.SynthesizeRequest, context):
        if self.tts_pipeline is None:
            yield pb.SynthesizeResponse(done=True, error="no TTS pipeline loaded")
            return
        try:
            wav, info = self.tts_pipeline.synthesize(
                request.text,
                np.asarray(request.prompt_wav_16k, np.float32),
                np.asarray(request.prompt_wav_24k, np.float32),
                max_new_tokens=int(request.max_new_tokens) if request.max_new_tokens else 256,
            )
        except (KeyError, ValueError) as e:
            yield pb.SynthesizeResponse(done=True, error=f"bad request: {e}")
            return
        wav = np.asarray(wav, np.float32).ravel()
        sr = int(info.get("sample_rate", 22050)) if isinstance(info, dict) else 22050
        for start in range(0, max(len(wav), 1), _WAV_CHUNK_SAMPLES):
            piece = wav[start : start + _WAV_CHUNK_SAMPLES]
            last = start + _WAV_CHUNK_SAMPLES >= len(wav)
            yield pb.SynthesizeResponse(
                wav_f32le=piece.astype("<f4").tobytes(),
                sample_rate=sr,
                done=last,
                info_json=json.dumps(info) if last else "",
            )

    # --------------------------------------------------------- HealthCheck
    def HealthCheck(self, request: pb.HealthCheckRequest, context):
        return pb.HealthCheckResponse(
            ok=True,
            active_slots=self.orch.active_slots(),
            queue_depth=self.orch.queue.qsize(),
        )


def _handlers(svc: OrchestratorService):
    import grpc

    return grpc.method_handlers_generic_handler(
        SERVICE_NAME,
        {
            "Decode": grpc.unary_stream_rpc_method_handler(
                svc.Decode,
                request_deserializer=pb.DecodeRequest.FromString,
                response_serializer=pb.DecodeResponse.SerializeToString,
            ),
            "Synthesize": grpc.unary_stream_rpc_method_handler(
                svc.Synthesize,
                request_deserializer=pb.SynthesizeRequest.FromString,
                response_serializer=pb.SynthesizeResponse.SerializeToString,
            ),
            "HealthCheck": grpc.unary_unary_rpc_method_handler(
                svc.HealthCheck,
                request_deserializer=pb.HealthCheckRequest.FromString,
                response_serializer=pb.HealthCheckResponse.SerializeToString,
            ),
        },
    )


class OrchestratorStub:
    """Client stub (hand-wired equivalent of generated *_pb2_grpc stubs)."""

    def __init__(self, channel):
        self.Decode = channel.unary_stream(
            f"/{SERVICE_NAME}/Decode",
            request_serializer=pb.DecodeRequest.SerializeToString,
            response_deserializer=pb.DecodeResponse.FromString,
        )
        self.Synthesize = channel.unary_stream(
            f"/{SERVICE_NAME}/Synthesize",
            request_serializer=pb.SynthesizeRequest.SerializeToString,
            response_deserializer=pb.SynthesizeResponse.FromString,
        )
        self.HealthCheck = channel.unary_unary(
            f"/{SERVICE_NAME}/HealthCheck",
            request_serializer=pb.HealthCheckRequest.SerializeToString,
            response_deserializer=pb.HealthCheckResponse.FromString,
        )


def create_server(orch: Orchestrator, tts_pipeline=None, port: int = 9000,
                  max_workers: int = 64):
    """Build (but do not start) a grpc.Server bound to [::]:port.

    The orchestrator must already be start()ed by the caller; sharing one
    orchestrator lets the HTTP and gRPC front-ends serve the same slots
    (reference: jetstream server_lib.run threads=256, port=9000).
    """
    import grpc

    server = grpc.server(
        futures.ThreadPoolExecutor(max_workers=max_workers),
        options=[("grpc.max_send_message_length", 64 * 1024 * 1024)],
    )
    server.add_generic_rpc_handlers((_handlers(OrchestratorService(orch, tts_pipeline)),))
    bound = server.add_insecure_port(f"[::]:{port}")
    server._mtt_port = bound  # actual port when port=0 (tests)
    return server


def serve_grpc(cfg: Config, port: int | None = None, engine: Engine | None = None,
               tts_pipeline=None):
    """Blocking gRPC server entry point (reference: maxengine_server.main)."""
    orch = Orchestrator(
        engine or (tts_pipeline.engine if tts_pipeline else Engine(cfg)),
        steps_per_dispatch=cfg.serving_steps_per_dispatch,
        mode=cfg.serving_mode,
    )
    orch.start()
    server = create_server(
        orch, tts_pipeline, port=port or cfg.inference_server_port
    )
    server.start()
    try:
        server.wait_for_termination()
    finally:
        server.stop(grace=1)
        orch.stop()


def main(argv=None):
    import sys

    from maxtext_indextts2_tpu.config import load_config

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    print(f"gRPC serving on :{cfg.inference_server_port}")
    serve_grpc(cfg)


if __name__ == "__main__":
    main()
