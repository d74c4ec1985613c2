"""Generate per-family configs/<fam>/{README.md,metafile.yml} + model-index.yml.

The reference ships per-config-dir benchmark metadata (``README.md`` +
``metafile.yml`` indexed by ``model-index.yml:1-20``). This repo cannot
reproduce those DOTA numbers without the (unavailable) DOTA imagery, so each
family's metadata records BOTH:

- the reference-published DOTA/HRSC mAP as the **parity target** (quoted
  from BASELINE.md, which cites the reference's own README/metafile lines);
- this repo's **synthetic-DOTA protocol** result (RESULTS.md): the tiny
  config trained from scratch on one TPU v5e chip, evaluated with the full
  production path (batched inference -> decode -> rotated NMS ->
  eval_rbbox_map @ IoU 0.5). Read live from ``work_dirs/*/train_log.jsonl``.

Re-run after new synth training runs finish:
    python .dev_scripts/gen_metafiles.py
"""

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fam -> dict(title, paper, ref_rows=[(label, map, fps)], synth_wd, note)
# ref numbers quote BASELINE.md (which cites /root/reference config READMEs);
# fps is the reference's GTX 1080 Ti inference fps where published.
FAMILIES = {
    'rotated_retinanet': dict(
        title='Rotated RetinaNet',
        paper='Focal Loss for Dense Object Detection',
        ref_rows=[
            ('rotated_retinanet_hbb_r50_fpn_1x_dota_oc', 64.55, 15.7),
            ('rotated_retinanet_obb_r50_fpn_1x_dota_le90', 68.42, 16.9),
            ('rotated_retinanet_obb_r50_fpn_fp16_1x_dota_le90', 68.79, 22.4),
            ('rotated_retinanet_obb_r50_fpn_1x_dota_le135', 69.79, 17.2),
            ('rotated_retinanet_obb_r50_fpn_1x_dota_ms_rr_le90', 76.50, 17.5),
            ('rotated_retinanet_hbb_r50_fpn_6x_hrsc_rr_oc (HRSC mAP)',
             45.09, 39.2),
            ('rotated_retinanet_obb_r50_fpn_6x_hrsc_rr_le90 (HRSC mAP)',
             52.06, 38.2),
        ],
        synth_wd='synth',
        note='The flagship single-stage family; also the bench.py model '
             '(R50-FPN @ 1024, bf16).'),
    'rotated_atss': dict(
        title='Rotated ATSS',
        paper='Bridging the Gap Between Anchor-based and Anchor-free '
              'Detection via Adaptive Training Sample Selection',
        ref_rows=[
            ('rotated_atss_obb_r50_fpn_1x_dota_le90', 70.64, None),
            ('rotated_atss_obb_r50_fpn_1x_dota_le135', 72.29, None),
        ],
        synth_wd=None,
        note='Shares the RetinaNet towers; swaps MaxIoU assignment for '
             'ATSSObbAssigner.'),
    'rotated_fcos': dict(
        title='Rotated FCOS',
        paper='FCOS: Fully Convolutional One-Stage Object Detection',
        ref_rows=[
            ('rotated_fcos_r50_fpn_1x_dota_le90', 70.70, None),
            ('rotated_fcos_sep_angle_r50_fpn_1x_dota_le90', 71.28, None),
            ('rotated_fcos_csl_gaussian_r50_fpn_1x_dota_le90', 71.76, None),
            ('rotated_fcos_kld_r50_fpn_1x_dota_le90', 71.89, None),
        ],
        synth_wd='synth_rotated_fcos'),
    'rotated_reppoints': dict(
        title='Rotated RepPoints',
        paper='RepPoints: Point Set Representation for Object Detection',
        ref_rows=[('rotated_reppoints_r50_fpn_1x_dota_oc', 59.44, 15.6)],
        synth_wd=None),
    'oriented_reppoints': dict(
        title='Oriented RepPoints',
        paper='Oriented RepPoints for Aerial Object Detection',
        ref_rows=[
            ('oriented_reppoints_r50_fpn_1x_dota_le135', 71.94, None),
            ('oriented_reppoints_r50_fpn_40e_dota_ms_le135', 75.21, None),
        ],
        synth_wd='synth_oriented_reppoints'),
    'sasm_reppoints': dict(
        title='SASM RepPoints',
        paper='Shape-Adaptive Selection and Measurement for Oriented '
              'Object Detection',
        ref_rows=[('sasm_reppoints_r50_fpn_1x_dota_oc', 66.45, 15.3)],
        synth_wd='synth_sasm'),
    'cfa': dict(
        title='CFA',
        paper='Beyond Bounding-Box: Convex-hull Feature Adaptation for '
              'Oriented and Densely Packed Object Detection',
        ref_rows=[
            ('cfa_r50_fpn_1x_dota_le135', 69.63, None),
            ('cfa_r50_fpn_40e_dota_oc', 73.45, 16.1),
        ],
        synth_wd='synth_cfa'),
    'g_reppoints': dict(
        title='G-RepPoints',
        paper='G-Rep: Gaussian Representation for Arbitrary-Oriented '
              'Object Detection',
        ref_rows=[('g_reppoints_r50_fpn_1x_dota_le135', 69.49, None)],
        synth_wd='synth_g_reppoints'),
    'gwd': dict(
        title='GWD',
        paper='Rethinking Rotated Object Detection with Gaussian '
              'Wasserstein Distance Loss',
        ref_rows=[('rotated_retinanet_hbb_gwd_r50_fpn_1x_dota_oc',
                   69.55, 15.5)],
        synth_wd='synth_gwd'),
    'kld': dict(
        title='KLD',
        paper='Learning High-Precision Bounding Box for Rotated Object '
              'Detection via Kullback-Leibler Divergence',
        ref_rows=[
            ('rotated_retinanet_obb_kld_stable_r50_fpn_1x_dota_le90',
             70.22, 16.9),
            ('rotated_retinanet_obb_kld_stable_r50_adamw_fpn_1x_dota_le90',
             71.30, 16.9),
        ],
        synth_wd='synth_kld'),
    'kfiou': dict(
        title='KFIoU',
        paper='The KFIoU Loss for Rotated Object Detection',
        ref_rows=[
            ('rotated_retinanet_hbb_kfiou_r50_fpn_1x_dota_le90',
             69.60, None),
            ('rotated_retinanet_hbb_kfiou_r50_fpn_1x_dota_le135',
             69.77, None),
        ],
        synth_wd='synth_kfiou'),
    'csl': dict(
        title='CSL',
        paper='Arbitrary-Oriented Object Detection with Circular Smooth '
              'Label',
        ref_rows=[('rotated_retinanet_obb_csl_gaussian_r50_fpn_fp16_1x_'
                   'dota_le90', 69.51, None)],
        synth_wd='synth_csl'),
    'r3det': dict(
        title='R3Det',
        paper='R3Det: Refined Single-Stage Detector with Feature '
              'Refinement for Rotating Object',
        ref_rows=[
            ('r3det_r50_fpn_1x_dota_oc', 69.80, 12.4),
            ('r3det_tiny_r50_fpn_1x_dota_oc', 70.18, 15.6),
        ],
        synth_wd='synth_r3det'),
    's2anet': dict(
        title='S2ANet',
        paper='Align Deep Features for Oriented Object Detection',
        ref_rows=[
            ('s2anet_r50_fpn_1x_dota_le135', 73.91, None),
            ('s2anet_r50_fpn_fp16_1x_dota_le135', 74.19, None),
            ('s2anet_r50_fpn_3x_hrsc_le135 (HRSC AP50)', 89.75, None),
        ],
        synth_wd='synth_s2anet'),
    'rotated_faster_rcnn': dict(
        title='Rotated Faster R-CNN',
        paper='Faster R-CNN: Towards Real-Time Object Detection with '
              'Region Proposal Networks',
        ref_rows=[('rotated_faster_rcnn_r50_fpn_1x_dota_le90',
                   73.40, 16.5)],
        synth_wd='synth_rotated_faster_rcnn'),
    'gliding_vertex': dict(
        title='Gliding Vertex',
        paper='Gliding Vertex on the Horizontal Bounding Box for '
              'Multi-Oriented Object Detection',
        ref_rows=[('gliding_vertex_r50_fpn_1x_dota_le90', 73.23, 16.4)],
        synth_wd='synth_gliding_vertex'),
    'oriented_rcnn': dict(
        title='Oriented R-CNN',
        paper='Oriented R-CNN for Object Detection',
        ref_rows=[
            ('oriented_rcnn_r50_fpn_1x_dota_le90', 75.69, 16.2),
            ('oriented_rcnn_r50_fpn_fp16_1x_dota_le90', 75.63, 21.2),
        ],
        synth_wd='synth_oriented_rcnn',
        note='Second north-star parity config (BASELINE.json).'),
    'roi_trans': dict(
        title='RoI Transformer',
        paper='Learning RoI Transformer for Oriented Object Detection in '
              'Aerial Images',
        ref_rows=[
            ('roi_trans_r50_fpn_1x_dota_le90', 76.08, None),
            ('roi_trans_r50_fpn_1x_dota_ms_rr_le90', 79.66, None),
        ],
        synth_wd='synth_roi_trans'),
    'redet': dict(
        title='ReDet',
        paper='ReDet: A Rotation-equivariant Detector for Aerial Object '
              'Detection',
        ref_rows=[
            ('redet_re50_refpn_1x_dota_le90', 76.68, None),
            ('redet_re50_refpn_fp16_1x_dota_le90', 75.99, None),
            ('redet_re50_refpn_1x_dota_ms_rr_le90', 79.87, None),
            ('redet_re50_refpn_3x_hrsc_le90 (HRSC AP50)', 90.40, None),
        ],
        synth_wd='synth_redet',
        note='ReResNet/ReFPN rebuilt as precomputed C8 basis-expansion '
             'convs (no e2cnn); exact at 90-degree multiples, interpolated '
             'at 45 degrees — see backbones/re_resnet.py docstring for the '
             'parity-risk register.'),
    'jy': dict(
        title='RotatedYOLOv8 / jy prototypes',
        paper="the fork author's RotatedYOLOv8 research line (reference "
              'README.md:11-17)',
        ref_rows=[
            ('rotated_yolov8 base (DOTA AP)', 72.8, None),
            ('prototype3 (CSPNeXt-L, bs16)', 79.4, None),
            ('prototype4 (CSPNeXt-M 0.67/0.75, bs8)', 79.5, None),
        ],
        synth_wd='synth_yolov8',
        note='Anchor-free cost-based OBBLabelAssigner + '
             'DistanceAnglePoint decode + rotated-IoU loss; the fork '
             'README publishes prototype1/2 at 78.1/78.7 without configs '
             'in-tree.'),
    'convnext': dict(
        title='ConvNeXt backbone',
        paper='A ConvNet for the 2020s',
        ref_rows=[('rotated_retinanet_obb_kld_stable_convnext_adamw_fpn_'
                   '1x_dota_le90', 74.49, 7.9)],
        synth_wd=None),
    'hrsc': dict(
        title='HRSC2016 (ship detection)',
        paper='HRSC2016 dataset configs',
        ref_rows=[],
        synth_wd='synth_hrsc',
        note='VOC-XML ship dataset; reference publishes HRSC rows inside '
             'family READMEs (retinanet/s2anet/redet) — mirrored in those '
             'families here. This dir holds the HRSC synth-protocol '
             'existence proof.'),
    'sar': dict(
        title='SAR (SSDD/HRSID ship detection)',
        paper='SAR ship dataset configs',
        ref_rows=[],
        synth_wd=None,
        note='Single-class DOTA-format variant (datasets/dota.py '
             'SARDataset).'),
}


def best_synth_map(wd):
    """Best in-training eval mAP from a committed work_dirs log."""
    path = os.path.join(REPO, 'work_dirs', wd, 'train_log.jsonl')
    if not os.path.exists(path):
        return None
    best = None
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get('mAP') is not None:
                best = max(best or 0.0, float(rec['mAP']))
    return best


def main():
    cfg_root = os.path.join(REPO, 'configs')
    index_entries = []
    for fam, meta in sorted(FAMILIES.items()):
        fam_dir = os.path.join(cfg_root, fam)
        if not os.path.isdir(fam_dir):
            continue
        cfgs = sorted(f for f in os.listdir(fam_dir) if f.endswith('.py'))
        ref_map = {label.split(' ')[0]: (m, fps)
                   for label, m, fps in meta['ref_rows']}
        synth = best_synth_map(meta['synth_wd']) if meta['synth_wd'] else None

        # ---- README.md --------------------------------------------------
        lines = ['# {}'.format(meta['title']), '']
        lines += ['> {}'.format(meta['paper']), '']
        if meta.get('note'):
            lines += [meta['note'], '']
        if meta['ref_rows']:
            lines += ['## Parity targets (reference-published, '
                      'GTX 1080 Ti, DOTA-v1.0 unless noted)', '',
                      '| Config | mAP | fps |', '|---|---|---|']
            for label, m, fps in meta['ref_rows']:
                lines.append('| {} | {} | {} |'.format(
                    label, m, fps if fps is not None else '-'))
            lines += ['', 'Quoted from `BASELINE.md`, which cites the '
                      "reference's `configs/{}/README.md` / "
                      '`metafile.yml`.'.format(fam), '']
        if synth is not None:
            lines += ['## TPU synth-protocol result (this repo)', '',
                      'Trained from scratch on 1x TPU v5e with the '
                      'synthetic-DOTA protocol (RESULTS.md): best '
                      'in-training eval **mAP@0.5 = {:.3f}** '
                      '(`work_dirs/{}/train_log.jsonl`).'.format(
                          synth, meta['synth_wd']), '']
        elif meta['synth_wd']:
            lines += ['## TPU synth-protocol result (this repo)', '',
                      'Run pending — work_dir `work_dirs/{}` not yet '
                      'trained.'.format(meta['synth_wd']), '']
        lines += ['## Configs', '']
        lines += ['- `{}`'.format(c) for c in cfgs] + ['']
        with open(os.path.join(fam_dir, 'README.md'), 'w') as f:
            f.write('\n'.join(lines))

        # ---- metafile.yml -----------------------------------------------
        y = ['Collections:',
             '- Name: {}'.format(fam),
             '  Metadata:',
             '    Training Data: DOTAv1.0 (parity targets) / synthetic-DOTA'
             ' protocol (this repo)',
             '    Training Resources: 1x TPU v5e chip',
             '  Paper:',
             "    Title: '{}'".format(meta['paper'].replace("'", "''")),
             '  README: configs/{}/README.md'.format(fam),
             '',
             'Models:']
        for c in cfgs:
            name = c[:-3]
            y += ['  - Name: {}'.format(name),
                  '    In Collection: {}'.format(fam),
                  '    Config: configs/{}/{}'.format(fam, c)]
            results = []
            if name in ref_map:
                results.append(('DOTAv1.0 (reference parity target)',
                                ref_map[name][0]))
            if 'tiny_synth' in name and synth is not None:
                results.append(('synthetic-DOTA protocol (TPU v5e)',
                                round(synth * 100, 2)))
            if results:
                y.append('    Results:')
                for ds, m in results:
                    y += ['      - Task: Oriented Object Detection',
                          '        Dataset: {}'.format(ds),
                          '        Metrics:',
                          '          mAP: {}'.format(m)]
        with open(os.path.join(fam_dir, 'metafile.yml'), 'w') as f:
            f.write('\n'.join(y) + '\n')
        index_entries.append('  - configs/{}/metafile.yml'.format(fam))

    with open(os.path.join(REPO, 'model-index.yml'), 'w') as f:
        f.write('Import:\n' + '\n'.join(index_entries) + '\n')
    print('wrote {} families + model-index.yml'.format(len(index_entries)))


if __name__ == '__main__':
    main()
