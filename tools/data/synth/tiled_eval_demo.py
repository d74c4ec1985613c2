"""Full DOTA-style tiled-eval drive (reference huge-image flow:
``img_split.py`` -> ``tools/test.py --format-only`` -> ``merge_det`` ->
Task1 zip): generates 1024px synthetic scenes, tiles them 256/gap-64, runs
batched inference with a trained tiny-synth checkpoint, merges patch
detections back to the original frame, writes the submission zip and
scores original-frame mAP (measured: 0.9532 with the round-2 checkpoint).

    python tools/data/synth/tiled_eval_demo.py [checkpoint] [--ms]

``--ms`` drives the MULTI-SCALE split path (reference
``split_configs/ms_*.json`` + ``core/patch/split.py:8-28``): rates
0.5/1.0/2.0 produce 512/256/128 px windows over the same scenes
(``img_split.py --rates``; window size rides in the tile filename so
offsets cannot collide), inference runs on a canvas sized for the largest
window, and ``merge_det`` NMS-merges detections from all three scales in
the original frame.
"""
import os
import os.path as osp
import subprocess
import sys
import zipfile

import numpy as np

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..', '..'))
# sibling module (tools/ is not a package)
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from generate_synth import generate_synth

MS = '--ms' in sys.argv
if MS:
    sys.argv.remove('--ms')
BIG = '/tmp/synth_big'
SPLIT = '/tmp/synth_split_ms' if MS else '/tmp/synth_split'

# 1. six 1024x1024 scenes with up to 18 objects
generate_synth(BIG, num_images=6, size=1024, seed=7, split='test',
               max_objs=18)
print('big images written', flush=True)

# 2. offline tiler: 256px windows, 64px gap
split_cmd = [sys.executable,
             '/root/repo/tools/data/dota/split/img_split.py',
             '--img-dirs', f'{BIG}/test/images',
             '--ann-dirs', f'{BIG}/test/annfiles',
             '--save-dir', SPLIT, '--sizes', '256', '--gaps', '64']
if MS:
    split_cmd += ['--rates', '0.5', '1.0', '2.0']
subprocess.run(split_cmd, check=True)
n_tiles = len(os.listdir(f'{SPLIT}/images'))
print(f'tiled into {n_tiles} patches', flush=True)

# 3. dataset over the tiles + the trained tiny retinanet
from orientedobjectdetection_tpu.apis.eval import batched_eval
from orientedobjectdetection_tpu.apis.inference import init_detector
from orientedobjectdetection_tpu.datasets import build_dataset
from orientedobjectdetection_tpu.utils import Config

cfg = Config.fromfile(
    '/root/repo/configs/rotated_retinanet/rotated_retinanet_tiny_synth.py')
split_spec = dict(cfg.data['test'], test_mode=True, filter_empty_gt=False)
split_spec['ann_file'] = f'{SPLIT}/annfiles'
split_spec['img_prefix'] = f'{SPLIT}/images'
dataset = build_dataset(split_spec)
print(f'split dataset: {len(dataset)} tiles', flush=True)

ckpt = sys.argv[1] if len(sys.argv) > 1 else \
    '/tmp/wd_synth_full/ckpt_00002500.msgpack'
if MS:
    # rate 0.5 -> 512 px windows: evaluate on a canvas fitting the largest
    # scale (the model is fully convolutional; tiles are crops, never
    # resampled, so detections stay in original-image pixels)
    cfg.pad_size = (512, 512)
    cfg.data['pad_size'] = (512, 512)
bundle = init_detector(cfg, ckpt)
results = batched_eval(bundle, dataset, batch_size=8)
print('inference done', flush=True)

# 4. submission zip (merge_det inside)
zip_path = dataset.format_results(results, submission_dir='/tmp/synth_sub')
with zipfile.ZipFile(zip_path) as zf:
    names = zf.namelist()
    lines = sum(len(zf.read(n).decode().splitlines()) for n in names)
print(f'submission: {zip_path} files={names} total_dets={lines}', flush=True)

# 5. original-frame mAP: merged dets vs the original 1024px annotations
from orientedobjectdetection_tpu.core.eval_map import eval_rbbox_map

ids, merged = dataset.merge_det(results)
orig_spec = dict(split_spec)
orig_spec['ann_file'] = f'{BIG}/test/annfiles'
orig_spec['img_prefix'] = f'{BIG}/test/images'
orig = build_dataset(orig_spec)
by_id = {osp.splitext(info['filename'])[0]: info['ann']
         for info in orig.data_infos}
annotations = [dict(bboxes=by_id[i]['bboxes'], labels=by_id[i]['labels'],
                    bboxes_ignore=np.zeros((0, 5), np.float32),
                    labels_ignore=np.zeros((0,), np.int64)) for i in ids]
mean_ap, _ = eval_rbbox_map(merged, annotations, iou_thr=0.5,
                            dataset=orig.CLASSES)
print(f'ORIGINAL-FRAME tiled-merge mAP: {mean_ap:.4f}', flush=True)
