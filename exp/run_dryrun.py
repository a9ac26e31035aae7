import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
fn, args = g.entry()
out = jax.jit(fn)(*args)
print("entry() compile+run ok:", jax.tree.map(lambda a: a.shape, out))
