"""Config-zoo metadata: every family dir ships README.md + metafile.yml and
the metafiles reference real config paths (reference analog:
``model-index.yml`` indexing per-dir ``metafile.yml``)."""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
CFG_ROOT = os.path.join(REPO, 'configs')


def _family_dirs():
    return sorted(d for d in os.listdir(CFG_ROOT)
                  if os.path.isdir(os.path.join(CFG_ROOT, d))
                  and d != '_base_')


def test_every_family_has_metadata():
    missing = []
    for fam in _family_dirs():
        for fname in ('README.md', 'metafile.yml'):
            if not os.path.exists(os.path.join(CFG_ROOT, fam, fname)):
                missing.append('{}/{}'.format(fam, fname))
    assert not missing, 'missing config metadata: {}'.format(missing)


def test_model_index_imports_every_family():
    path = os.path.join(REPO, 'model-index.yml')
    assert os.path.exists(path)
    body = open(path).read()
    for fam in _family_dirs():
        assert 'configs/{}/metafile.yml'.format(fam) in body, fam


def test_metafile_config_paths_exist():
    for fam in _family_dirs():
        meta = open(os.path.join(CFG_ROOT, fam, 'metafile.yml')).read()
        for cfg in re.findall(r'Config: (\S+)', meta):
            assert os.path.exists(os.path.join(REPO, cfg)), cfg


def test_every_config_listed_in_metafile():
    for fam in _family_dirs():
        meta = open(os.path.join(CFG_ROOT, fam, 'metafile.yml')).read()
        listed = {os.path.basename(c)
                  for c in re.findall(r'Config: (\S+)', meta)}
        on_disk = {f for f in os.listdir(os.path.join(CFG_ROOT, fam))
                   if f.endswith('.py')}
        assert on_disk <= listed, (
            '{}: configs missing from metafile: {}'.format(
                fam, sorted(on_disk - listed)))
