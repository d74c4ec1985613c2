"""Print the fully-merged config (reference ``tools/misc/print_config.py``)."""
import argparse
import os.path as osp
import sys

try:  # prefer the installed package; fall back to the checkout
    import orientedobjectdetection_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))

from orientedobjectdetection_tpu.utils import Config  # noqa: E402

if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('config')
    args = p.parse_args()
    print(Config.fromfile(args.config).dump())
