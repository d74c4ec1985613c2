# Swin-tiny KFIoU RoI-Transformer on the ms+rr split (reference same name).
_base_ = ['./roi_trans_kfiou_ln_swin_tiny_fpn_1x_dota_le90.py']
data_root = 'data/split_ms_dota1_0/'
data = dict(
    train=dict(ann_file=data_root + 'trainval/annfiles/',
               img_prefix=data_root + 'trainval/images/'),
    val=dict(ann_file=data_root + 'trainval/annfiles/',
             img_prefix=data_root + 'trainval/images/'),
    test=dict(ann_file=data_root + 'test/images/',
              img_prefix=data_root + 'test/images/'))
