"""Block until the axon TPU backend initializes and runs a trivial
program; prints one line per attempt. Exits 0 on recovery."""
import subprocess, sys, time
PROBE = ("import jax, jax.numpy as jnp, numpy as np; "
         "x = jax.jit(lambda: jnp.arange(8, dtype=jnp.int32).sum())(); "
         "print('TPU OK', int(np.asarray(x)))")
deadline = time.time() + float(sys.argv[1]) if len(sys.argv) > 1 else time.time() + 7200
while time.time() < deadline:
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", PROBE],
                           capture_output=True, text=True, timeout=900)
        ok = r.returncode == 0 and "TPU OK" in r.stdout
        rc = r.returncode
    except subprocess.TimeoutExpired:
        ok, rc = False, "timeout"
    r = None
    print(f"{time.strftime('%H:%M:%S')} probe rc={rc} "
          f"ok={ok} ({time.time()-t0:.0f}s)", flush=True)
    if ok:
        sys.exit(0)
    time.sleep(120)
sys.exit(1)
