"""Target module for the launch_multihost 2-process CPU smoke: verifies the
distributed runtime came up, the global mesh spans both processes, and a
cross-process collective produces the right value."""
import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.experimental import multihost_utils
from jax.sharding import Mesh, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
mesh = Mesh(np.array(jax.devices()), ("data",))

local = np.ones((jax.local_device_count(),), np.float32)
global_x = multihost_utils.host_local_array_to_global_array(local, mesh,
                                                            P("data"))
out = jax.jit(shard_map(lambda x: jax.lax.psum(jnp.sum(x), "data"),
                        mesh=mesh, in_specs=P("data"), out_specs=P()))(global_x)
total = float(out)
assert total == jax.device_count(), (total, jax.device_count())
print(f"MULTIHOST_SMOKE_OK process={jax.process_index()} "
      f"devices={jax.device_count()} psum={total}", flush=True)
