"""Strip optimizer state and append a content hash (reference
``tools/model_converters/publish_model.py``).

    python tools/model_converters/publish_model.py in.msgpack out.msgpack
"""
import argparse
import hashlib

from flax import serialization


def main():
    p = argparse.ArgumentParser()
    p.add_argument('in_file')
    p.add_argument('out_file')
    args = p.parse_args()
    with open(args.in_file, 'rb') as f:
        state = serialization.msgpack_restore(f.read())
    published = {k: v for k, v in state.items()
                 if k in ('params', 'batch_stats')}
    blob = serialization.msgpack_serialize(published)
    sha = hashlib.sha256(blob).hexdigest()[:8]
    out = args.out_file
    if out.endswith('.msgpack'):
        out = out[:-8].rstrip('.-_') + f'-{sha}.msgpack'
    with open(out, 'wb') as f:
        f.write(blob)
    print(f'published to {out}')


if __name__ == '__main__':
    main()
