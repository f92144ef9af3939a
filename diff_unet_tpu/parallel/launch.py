"""Multi-process launcher — the reference's `launch_dist` analogue.

The reference self-relaunches through `torch.distributed.launch` with
MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE env vars
(light_training/launch.py:69-117). On TPU pods the runtime starts one
process per host, so a launcher is only needed for single-host
multi-process runs (CPU/debug) and for driving scripts that call
`parallel.auto_initialize()` — which consumes exactly the same env
conventions.

CLI:  python -m diff_unet_tpu.parallel.launch --nprocs 2 train.py \
          --config cfg/amos/train.yaml
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import Dict, List, Optional, Sequence


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(
    argv: Sequence[str],
    nprocs: int,
    *,
    master_addr: str = "127.0.0.1",
    master_port: Optional[int] = None,
    env_extra: Optional[Dict[str, str]] = None,
    timeout: Optional[float] = None,
) -> List[subprocess.CompletedProcess]:
    """Spawn `nprocs` copies of `argv` with the rendezvous env vars set
    (MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK — launch.py:87-101 parity;
    `parallel.auto_initialize()` reads the same names) and wait for all.

    Raises CalledProcessError on the first non-zero exit. Returns the
    completed processes (stdout/stderr captured) in rank order.
    """
    port = master_port or free_port()
    procs = []
    for rank in range(nprocs):
        env = dict(os.environ)
        env.update({
            "MASTER_ADDR": master_addr,
            "MASTER_PORT": str(port),
            "WORLD_SIZE": str(nprocs),
            "RANK": str(rank),
        })
        if env_extra:
            env.update(env_extra)
        procs.append(subprocess.Popen(
            list(argv), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    done = []
    failure = None
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            failure = failure or subprocess.CalledProcessError(
                -9, p.args, output=out)
            continue
        done.append(subprocess.CompletedProcess(p.args, p.returncode, out))
        if p.returncode != 0 and failure is None:
            failure = subprocess.CalledProcessError(
                p.returncode, p.args, output=out)
    if failure is not None:
        for p in procs:
            if p.poll() is None:
                p.kill()
        raise failure
    return done


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--master-addr", default="127.0.0.1")
    ap.add_argument("--master-port", type=int, default=None)
    ap.add_argument("script_and_args", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    results = launch(
        [sys.executable] + args.script_and_args, args.nprocs,
        master_addr=args.master_addr, master_port=args.master_port,
    )
    for rank, r in enumerate(results):
        sys.stdout.write(f"--- rank {rank} ---\n{r.stdout}")


if __name__ == "__main__":
    main()
