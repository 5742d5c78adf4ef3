"""maxtext_indextts2_tpu: a TPU-native zero-shot TTS framework.

Built from scratch in JAX/XLA/Pallas with pjit sharding; capability parity
with the IndexTTS2-on-MaxText reference (see SURVEY.md). Subpackages:

- ``config``     typed configuration (yaml + CLI overrides)
- ``parallel``   device mesh + logical-axis sharding rules
- ``ops``        Pallas kernels and fused ops (attention, gmm, losses, stft)
- ``models``     decoder-LM layers and the model-family registry
- ``audio``      on-device audio stack: mel, semantic encoder, codecs, S2A, vocoder
- ``train``      training runtime (train loop, optimizers, checkpointing, data)
- ``infer``      inference engine (prefill/insert/generate, paged KV cache)
- ``vocab``      audio-token vocab expansion tools
- ``utils``      logging, metrics, profiling, flops accounting
"""

__version__ = "0.1.0"
