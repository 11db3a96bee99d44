#!/usr/bin/env python
"""Root-cause repro for the XLA:CPU crash deep into the test suite.

Symptom: running 60+ test files in one process, the interpreter dies inside
`jax` compiler `backend_compile_and_load` (observed as SIGSEGV/SIGABRT at
different test sites — sharded-training step, FullInertialBA — always after
many files' executables had accumulated).

Root cause (demonstrated here): every compiled XLA:CPU executable holds ~3
private anonymous mmap regions for its JIT code/data sections (LLVM ORC,
`contiguous_section_memory_manager.cc`), and they stay mapped for the life
of the executable. A process may hold at most `vm.max_map_count` regions
(65530 default). A deep suite at 8 virtual devices compiles thousands of
distinct programs; when the map count hits the cap, the next compile's
`allocateMappedMemory` fails and LLVM hard-exits the process:

    E ... contiguous_section_memory_manager.cc:101] allocateMappedMemory
        failed with error: Cannot allocate memory
    LLVM ERROR: Unable to allocate section memory!      (SIGABRT)

(depending on the failing allocation site this can also surface as a
SIGSEGV — same exhaustion path).

Fixes, in preference order:
  1. `jax.clear_caches()` periodically (the suite's per-module autouse
     fixture, tests/conftest.py) — releases the executables AND their maps
     (verified below: map count returns to baseline);
  2. split the suite across processes (tools/run_full_suite.sh batches the
     slow tier);
  3. raise `vm.max_map_count` (needs root; not available here).

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
          tools/xla_cpu_mapcount_repro.py [--crash]

Default mode measures map growth per compile + release on clear_caches
(fast, ~1 min). --crash additionally fills the map table to ~the cap with
1-page mmaps and triggers the fatal compile (the process DIES with the
exact error above — run it last).
"""
import argparse
import mmap
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def nmaps() -> int:
    return sum(1 for _ in open("/proc/self/maps"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crash", action="store_true",
                    help="fill the map table and trigger the fatal compile")
    ap.add_argument("--compiles", type=int, default=200)
    args = ap.parse_args()

    cap = int(open("/proc/sys/vm/max_map_count").read())
    print(f"vm.max_map_count = {cap}")
    jax.jit(lambda x: x + 1)(jnp.zeros(8)).block_until_ready()
    base = nmaps()
    print(f"maps after first compile: {base}")

    for k in range(args.compiles):
        n = 64 + k                       # distinct shape -> new executable
        f = jax.jit(lambda x: jnp.tanh(x @ x.T) @ x + jnp.sin(x).sum())
        f(jnp.zeros((n, n))).block_until_ready()
    grown = nmaps()
    per = (grown - base) / args.compiles
    print(f"maps after {args.compiles} more compiles: {grown} "
          f"(~{per:.1f} per live executable)")
    jax.clear_caches()
    print(f"maps after jax.clear_caches(): {nmaps()} (released)")
    est = int((cap - base) / max(per, 0.1))
    print(f"=> without cache drops the process dies after ~{est} live "
          f"executables; a 260-test 8-device suite plausibly exceeds that.")

    if not args.crash:
        print("(--crash to demonstrate the fatal compile at the cap)")
        return

    held = []
    page = mmap.PAGESIZE
    try:
        while nmaps() < cap - 100:
            # alternate protections so the kernel cannot merge regions
            held.append(mmap.mmap(-1, page, prot=mmap.PROT_READ))
            held.append(mmap.mmap(-1, page,
                                  prot=mmap.PROT_READ | mmap.PROT_WRITE))
    except Exception as e:
        print(f"filler stopped at {nmaps()} maps: {e}")
    print(f"map table filled to {nmaps()}; compiling (expect LLVM ERROR "
          f"'Unable to allocate section memory!' and process death)...",
          flush=True)
    f = jax.jit(lambda x: jnp.tanh(x @ x.T) @ x)
    f(jnp.zeros((300, 300))).block_until_ready()
    print("UNEXPECTED: compile survived", file=sys.stderr)


if __name__ == "__main__":
    main()
