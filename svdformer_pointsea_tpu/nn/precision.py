"""Global mixed-precision switch for training compute.

The two measured fwd+bwd hot spots of the PCN train step (B12, v5e,
tools/bwd_breakdown.py + tools/precision_probe.py) respond very differently
to precision:

- ImageTrunk (16-channel 224^2 convs, bandwidth/lane-bound): f32 62 ms ->
  bf16 31 ms (2x);
- SDG2 attention stack: f32 104 ms -> 92 ms with bf16 flash-attention
  *inputs* (the Pallas kernel accumulates in f32 either way); whole-module
  bf16 adds nothing further (102 ms) — the Dense/FFN matmuls are not the
  bottleneck there.

``set_mixed_precision(True)`` therefore flips exactly those two levers:
image-trunk compute dtype (params stay f32; conv/BN compute in bf16) and
flash-attention input dtype. Everything else — chamfer/metrics, losses,
optimizer state, FPS, eval defaults — stays f32.

Semantics and caveats:
- TRACE-TIME switch, like ``nn.set_flash_attention``: must be set before
  the first trace of any function that uses the trunks/attention; jit
  caches key on function identity, so flipping it later leaves compiled
  executables at the old precision. ``train_net`` sets it from
  ``cfg.train.precision`` before building any step function.
- Default OFF: the f32 path is the reference-faithful one (the reference
  trains in f32 on GPU); the metric-parity gate always runs with this
  switch off. Measured output shift when ON (random-init eval forward):
  bf16 trunk features move completions by CD-L2 ~2e-3 — fine for training
  throughput, not for parity evaluation.
"""

from __future__ import annotations

_MIXED_PRECISION = False


def set_mixed_precision(enabled: bool) -> None:
    """Enable bf16 compute for the image trunks and flash-attention inputs
    (params and all other compute stay f32). Trace-time switch — see the
    module docstring for ordering caveats."""
    global _MIXED_PRECISION
    _MIXED_PRECISION = bool(enabled)


def mixed_precision_enabled() -> bool:
    return _MIXED_PRECISION
