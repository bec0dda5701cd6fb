"""reftr_tpu — a TPU-native visual grounding framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ubc-vision/RefTR
("Referring Transformer: A One-step Approach to Multi-task Visual Grounding",
NeurIPS 2021): single-stage referring expression comprehension (REC, box
prediction) and referring expression segmentation (RES, mask prediction) from
an image plus one or many natural-language phrases.

Design is TPU-first rather than a port:
  * batch-first [B, S, D] tensors, NHWC images, static shapes (no NestedTensor;
    fixed-size padded canvases + boolean validity masks),
  * everything in the hot path lives inside a single jitted train/eval step,
  * SPMD via a (data, model) `jax.sharding.Mesh`; gradient reduction is an XLA
    all-reduce inserted by pjit, not a DDP hook,
  * bfloat16 compute with float32 params/accumulation by default on TPU,
  * Pallas kernels for the fused cross-modal attention hot op.
"""

__version__ = "0.1.0"
