"""Training CLI (reference ``tools/train.py:25-190``).

    python tools/train.py configs/rotated_retinanet/..._le90.py \
        --work-dir work_dirs/exp --cfg-options optimizer.lr=0.005
"""

import argparse
import ast
import os
import os.path as osp
import sys

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


def parse_args():
    p = argparse.ArgumentParser(description='Train a rotated detector')
    p.add_argument('config')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--resume-from', default=None)
    p.add_argument('--auto-resume', action='store_true')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--max-steps', type=int, default=None)
    p.add_argument('--bf16', action='store_true',
                   help='bf16 compute (fp32 params)')
    p.add_argument('--profile-dir', default=None,
                   help='write a jax.profiler trace (open with TensorBoard '
                        'or xprof) covering the whole run')
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.apis.train import train_detector
    from orientedobjectdetection_tpu.utils import Config

    # persistent compile cache: the 1-core host pays minutes per train/eval
    # program compile; cached reruns (protocol resumes, repeated families
    # sharing shapes) skip it entirely
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                     '/tmp/oodtpu_jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        opts = {}
        for item in args.cfg_options:
            key, _, val = item.partition('=')
            try:
                val = ast.literal_eval(val)
            except (ValueError, SyntaxError):
                pass
            opts[key] = val
        cfg.merge_from_dict(opts)

    work_dir = args.work_dir or osp.join(
        'work_dirs', osp.splitext(osp.basename(args.config))[0])
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.profile_dir:
        import jax
        jax.profiler.start_trace(args.profile_dir)
    try:
        train_detector(cfg, work_dir, resume=args.auto_resume,
                       resume_from=args.resume_from,
                       max_steps=args.max_steps, dtype=dtype, seed=args.seed)
    finally:
        if args.profile_dir:
            import jax
            jax.profiler.stop_trace()


if __name__ == '__main__':
    main()
