from flow_supervisor_tpu.losses.supervised import (
    flow_loss_l1,
    flow_loss_l2,
    flow_loss_robust,
    sequence_loss,
)
