"""Run a training command under a startup-wedge watchdog.

The axon TPU client occasionally wedges on its first device RPC: every
thread parks on a futex, the tunnel goes silent, and the process sits at
~11 s of CPU forever (round-5 post-mortem: four protocol families lost to
this before the pattern was identified). The wedge is indistinguishable
from a long compile by wall-clock alone, but not by ACTIVITY: a compiling
process burns host CPU (local tracing/lowering) or moves megabytes through
the tunnel relay (remote compile/execute). This wrapper samples both and
kills the child when neither moves for a sustained window.

    python tools/data/synth/run_with_watchdog.py --timeout 1680 \
        --log work_dirs/hard/<fam>/run.log -- python tools/train.py ...

Exit codes: child's own rc; 99 = startup wedge detected (caller should
retry); 124 = overall timeout (like ``timeout``).
"""

import argparse
import os
import subprocess
import sys
import time

CLK = os.sysconf('SC_CLK_TCK')


def cpu_seconds(pid):
    try:
        with open(f'/proc/{pid}/stat') as f:
            rest = f.read().rsplit(')', 1)[1].split()
        return (int(rest[11]) + int(rest[12])) / CLK   # utime + stime
    except (OSError, IndexError, ValueError):
        return None


def tunnel_pid():
    """Find the axon tunnel relay (python3 .../.tpu_init.py) without
    pattern-kill tools: walk /proc cmdlines."""
    for d in os.listdir('/proc'):
        if not d.isdigit():
            continue
        try:
            with open(f'/proc/{d}/cmdline', 'rb') as f:
                cmd = f.read().decode(errors='replace')
        except OSError:
            continue
        if 'tpu_init.py' in cmd and int(d) != os.getpid():
            return int(d)
    return None


def tunnel_bytes(pid):
    if pid is None:
        return None
    try:
        with open(f'/proc/{pid}/io') as f:
            vals = dict(line.split(':') for line in f.read().splitlines())
        return int(vals['rchar']) + int(vals['wchar'])
    except (OSError, KeyError, ValueError):
        return None


PROBE = ('import jax, jax.numpy as jnp; jax.devices(); '
         'print(float(jnp.ones((8, 8)).sum()))')


def preflight(attempts=4, timeout=90):
    """Throwaway device probe: the axon client wedge strikes a fresh
    client's FIRST device RPC ~half the time; burning it on an 11-second
    probe (retried fast) is far cheaper than burning a 5-minute wedge
    window on the real trainer. Returns once a probe computes on-device."""
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, '-c', PROBE],
                               timeout=timeout, capture_output=True)
            if r.returncode == 0 and b'64.0' in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f'[watchdog] preflight probe {i + 1} failed; retrying',
              file=sys.stderr)
        time.sleep(10)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--timeout', type=float, default=1680)
    ap.add_argument('--log', default=None,
                    help='redirect child stdout+stderr to this file')
    ap.add_argument('--grace', type=float, default=90,
                    help='seconds before wedge detection arms')
    ap.add_argument('--window', type=float, default=170,
                    help='a process idle (cpu+tunnel) this long is wedged')
    ap.add_argument('cmd', nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == '--' else args.cmd

    if preflight():      # advisory: proceed either way, odds improved
        # cool-down: a client started immediately after another client's
        # exit is exactly the wedge condition (round-5 post-mortem — the
        # probe itself recreated it); let the terminal settle first
        time.sleep(75)
    out = open(args.log, 'ab', buffering=0) if args.log else None
    child = subprocess.Popen(cmd, stdout=out or None,
                             stderr=subprocess.STDOUT if out else None)
    t0 = time.time()
    tun = tunnel_pid()
    last_cpu = cpu_seconds(child.pid) or 0.0
    last_io = tunnel_bytes(tun) or 0
    idle_since = None
    POLL = 20.0
    while True:
        try:
            rc = child.wait(timeout=POLL)
            sys.exit(rc)
        except subprocess.TimeoutExpired:
            pass
        now = time.time()
        if now - t0 > args.timeout:
            child.kill()
            child.wait()
            sys.exit(124)
        if now - t0 < args.grace:
            continue
        cpu = cpu_seconds(child.pid)
        io = tunnel_bytes(tun)
        cpu_moved = cpu is None or (cpu - last_cpu) > 1.0
        io_moved = io is None or (io - last_io) > 200_000
        if cpu_moved or io_moved:
            last_cpu, last_io = cpu or last_cpu, io or last_io
            idle_since = None
        elif idle_since is None:
            idle_since = now
        elif now - idle_since > args.window:
            print(f'[watchdog] wedge: cpu {cpu:.1f}s and tunnel idle '
                  f'{now - idle_since:.0f}s; killing', file=sys.stderr)
            child.kill()
            child.wait()
            sys.exit(99)


if __name__ == '__main__':
    main()
