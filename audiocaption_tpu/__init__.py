"""audiocaption_tpu — a TPU-native audio captioning framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
wsntxxn/AudioCaption (PyTorch): audio encoders (CNN14, EfficientNet-B2,
RNN/CRNN compositions), caption decoders (Transformer with KV cache,
Bahdanau-attention GRU), a fully batched decoding engine (greedy /
sampling / beam / diverse beam) compiled to a single XLA program,
a YAML-driven training stack with data parallelism over a
``jax.sharding.Mesh``, and an HF-style inference API.

Everything in the compute path is functional JAX: params are pytrees,
variable-length audio/text is handled with explicit length masks under
static shapes, and decoding runs inside ``lax.scan`` / ``lax.while_loop``
so a whole batch decodes in one device program (the reference decodes
sample-by-sample in Python: captioning/models/base.py:254-325).
"""

__version__ = "0.1.0"
