"""Device prefetch: overlap host batch assembly + H2D transfer with compute.

SURVEY.md §7 calls for a double-buffered host->HBM feed. JAX dispatch is
already asynchronous, but the H2D copy of a batch only starts when the
step is *called*; this iterator keeps `size` batches ahead by issuing
`jax.device_put` (optionally with a NamedSharding for the data axis)
before the consumer asks, so transfers ride under the previous step's
compute.
"""

import collections

import jax


def prefetch_to_device(iterator, size=2, sharding=None):
    """Wrap an iterator of pytrees, keeping `size` batches resident on
    device ahead of consumption."""

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    def gen():
        for batch in iterator:
            queue.append(put(batch))
            if len(queue) < size:
                continue
            yield queue.popleft()
        while queue:
            yield queue.popleft()

    return gen()
