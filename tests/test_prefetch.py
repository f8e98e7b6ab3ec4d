"""Prefetch + distributed-init utilities."""

import numpy as np

from multimodal_segmentation_tpu.data.prefetch import prefetch_to_device
from multimodal_segmentation_tpu.parallel.distributed import (
    maybe_initialize_distributed,
)


class TestPrefetch:
    def test_yields_all_batches_in_order(self):
        batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            np.testing.assert_allclose(np.asarray(b["x"]), i)

    def test_arrays_are_on_device(self):
        import jax

        out = next(prefetch_to_device(iter([{"x": np.zeros((2,))}]), size=1))
        assert isinstance(out["x"], jax.Array)

    def test_sharded_prefetch(self):
        import jax
        from multimodal_segmentation_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
        )

        mesh = make_mesh(n_data=8)
        batches = [{"x": np.zeros((8, 4), np.float32)}]
        out = next(
            prefetch_to_device(iter(batches), size=1, sharding=batch_sharding(mesh))
        )
        assert len(out["x"].sharding.device_set) == 8


class TestDistributedInit:
    def test_noop_without_env(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
        assert maybe_initialize_distributed() is False
