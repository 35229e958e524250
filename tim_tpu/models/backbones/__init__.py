from tim_tpu.models.backbones.vit import VideoMAEViT, videomae_vit_large
