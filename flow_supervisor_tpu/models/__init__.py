from flow_supervisor_tpu.models.raft import RAFT, RAFTConfig
