"""Minimal demonstration that THIS BOX's TPU relay backend leaks every
host->device transfer payload (host anon RSS, unreclaimable), which is what
OOM-killed the first 10k-step sustained training run at ~130 GB RSS
(~28 MB/step = exactly the batch payload).

The leak is in the platform transport, not the framework:
- a bare jitted reduction over a fresh 14.7 MB numpy input leaks ~14-16 MB
  per call (gc.collect(), arr.delete(), malloc_trim(0), and reusing one
  pinned numpy buffer all change nothing);
- the leak is proportional to the payload (a (8,8) input leaks ~nothing over
  200 calls; an f16 payload leaks half as much);
- a real TPU host (direct PCIe/DMA, no relay) does not traverse this path.

tools/bench_sustained.py therefore runs long training as checkpoint-resumed
SEGMENTS in fresh processes, sized so each segment stays well under the host
RAM ceiling. Run this probe to re-check the platform:

  python tools/relay_leak_probe.py [n_calls]

Healthy output is "leak ~0 MB/call"; on the leaking relay it reports the
input payload size per call.
"""

import sys

import numpy as np


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x, c):
        return jnp.sum(x) + c

    x0 = np.random.randn(32, 1440, 80).astype(np.float32)  # 14.7 MB
    payload_mb = x0.nbytes / 1e6
    c = jnp.asarray(0.0)
    c = f(x0, c)
    _ = float(c)  # warmup + sync

    r0 = rss_mb()
    for i in range(n):
        c = f(x0 + i, c)  # fresh host buffer each call, like a train batch
    _ = float(c)
    leaked = rss_mb() - r0
    print(f"payload {payload_mb:.1f} MB/call; leaked "
          f"{leaked / n:.1f} MB/call over {n} calls "
          f"({'LEAKING RELAY' if leaked / n > payload_mb / 2 else 'healthy'})")


if __name__ == "__main__":
    main()
