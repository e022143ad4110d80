"""svdformer_pointsea_tpu — a TPU-native point-cloud-completion framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
SVDFormer / PointSea / GeoSpecNet reference implementation (point cloud
completion with self-view augmentation), redesigned TPU-first:

- ``ops``: point-cloud kernels (FPS, kNN, grouping, chamfer, EMD, 3-NN
  interpolation, ball query) as Pallas kernels / fused XLA computations over
  fixed-shape tensors, each with a pure-jnp oracle.
- ``nn``: flax.linen building blocks and the three model families.
- ``render``: point→multi-view depth rasterizers.
- ``data``: dataset index parsing, host-side IO and transforms, fixed-shape
  batching with threaded device prefetch.
- ``train``: train/eval loops, optax schedules, orbax checkpointing.
- ``parallel``: device-mesh construction and sharding helpers.
- ``configs``: dataclass configs for the PCN / ShapeNet-55 / GeoSpec tracks.
"""

__version__ = "0.1.0"
