from r3m_tpu.models.resnet import (  # noqa: F401
    RESNET_SPECS,
    resnet_apply,
    resnet_init,
    resnet_out_dim,
)
