"""Evaluation / submission CLI (reference ``tools/test.py``).

    python tools/test.py <config> <ckpt> --eval mAP
    python tools/test.py <config> <ckpt> --format-only --submission-dir out/
"""

import argparse
import os.path as osp
import sys

import numpy as np

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


def parse_args():
    p = argparse.ArgumentParser(description='Test a rotated detector')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--eval', default=None, choices=[None, 'mAP'])
    p.add_argument('--format-only', action='store_true')
    p.add_argument('--submission-dir', default=None)
    p.add_argument('--out', default=None, help='pickle results path')
    p.add_argument('--bf16', action='store_true')
    p.add_argument('--max-images', type=int, default=None)
    p.add_argument('--batch-size', type=int, default=8,
                   help='images per compiled inference batch')
    p.add_argument('--data-parallel', action='store_true',
                   help='shard each batch over all local devices '
                        '(reference multi_gpu_test)')
    p.add_argument('--tta', action='store_true',
                   help='flip test-time augmentation: original + '
                        'horizontal + vertical flips merged with '
                        'per-class rotated NMS (reference aug_test, '
                        'rotated_anchor_head.py:692-787)')
    p.add_argument('--collect-dir', default=None,
                   help='shared dir for the multi-process result gather')
    p.add_argument('--show', action='store_true',
                   help='display annotated results interactively '
                        '(reference tools/test.py --show)')
    p.add_argument('--show-dir', default=None,
                   help='directory to write annotated result images '
                        '(reference tools/test.py --show-dir)')
    p.add_argument('--show-score-thr', type=float, default=0.3,
                   help='score threshold for rendered detections')
    p.add_argument('--cfg-options', nargs='+', default=[],
                   help='a.b.c=v deep config overrides '
                        '(reference tools/test.py --cfg-options)')
    return p.parse_args()


def _show_results(dataset, results, args, version):
    """Render per-image detections (reference ``tools/test.py`` show path ->
    ``detectors/base.py:19`` show_result -> ``core/visualization/image.py:77``
    imshow_det_rbboxes)."""
    import os

    import cv2

    from orientedobjectdetection_tpu.core.visualization import \
        imshow_det_rbboxes
    if args.show_dir:
        os.makedirs(args.show_dir, exist_ok=True)
    for i, result in enumerate(results):
        info = dataset.data_infos[i]
        img_path = osp.join(dataset.img_prefix, info['filename'])
        out_file = (osp.join(args.show_dir, info['filename'])
                    if args.show_dir else None)
        img = imshow_det_rbboxes(img_path, result,
                                 class_names=dataset.CLASSES,
                                 score_thr=args.show_score_thr,
                                 version=version, out_file=out_file)
        if args.show:
            cv2.imshow(info['filename'], img)
            cv2.waitKey(0)
            cv2.destroyAllWindows()
    if args.show_dir:
        print(f'annotated images written to {args.show_dir}')


def main():
    args = parse_args()
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.apis.eval import batched_eval
    from orientedobjectdetection_tpu.apis.inference import init_detector
    from orientedobjectdetection_tpu.datasets import build_dataset
    from orientedobjectdetection_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        import ast
        opts = {}
        for item in args.cfg_options:
            key, _, val = item.partition('=')
            try:
                val = ast.literal_eval(val)
            except (ValueError, SyntaxError):
                pass
            opts[key] = val
        cfg.merge_from_dict(opts)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    mesh = None
    if args.data_parallel:
        from orientedobjectdetection_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        if args.batch_size % mesh.devices.size:
            raise SystemExit(f'--batch-size must be a multiple of the '
                             f'device count ({mesh.devices.size})')
    # device-side normalization (default on): the bundle normalizes raw
    # uint8 batches inside the compiled program
    device_norm = None
    if cfg.data.get('normalize_on_device', True):
        from orientedobjectdetection_tpu.apis.eval import _default_norm
        device_norm = _default_norm(cfg)
    bundle = init_detector(cfg, args.checkpoint, dtype=dtype, mesh=mesh,
                           device_norm=device_norm)

    split = 'test' if args.format_only else 'val'
    dataset = build_dataset(dict(cfg.data[split], test_mode=True,
                                 filter_empty_gt=False))
    n = len(dataset) if args.max_images is None else \
        min(args.max_images, len(dataset))
    if args.tta:
        from orientedobjectdetection_tpu.apis.inference import (
            inference_detector_tta)
        version = cfg.model.get('bbox_head', {}).get(
            'version', cfg.get('angle_version', 'le90'))
        results = []
        for i in range(n):
            info = dataset.data_infos[i]
            img_path = osp.join(dataset.img_prefix, info['filename'])
            results.append(inference_detector_tta(bundle, img_path,
                                                  version=version))
            if (i + 1) % 20 == 0:
                print(f'tta eval {i + 1}/{n}')
    else:
        results = batched_eval(bundle, dataset, batch_size=args.batch_size,
                               max_images=n,
                               collect_dir=args.collect_dir)

    if args.show or args.show_dir:
        version = cfg.model.get('bbox_head', {}).get(
            'version', cfg.get('angle_version', 'le90'))
        dataset.data_infos = dataset.data_infos[:n]
        _show_results(dataset, results, args, version)
    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)
    if args.format_only:
        path = dataset.format_results(results,
                                      submission_dir=args.submission_dir)
        print(f'submission written to {path}')
    if args.eval:
        dataset.data_infos = dataset.data_infos[:n]
        metrics = dataset.evaluate(results, metric=args.eval)
        print(metrics)


if __name__ == '__main__':
    main()
