from .lnn_seq import LNNSeq, SeqState, init_state
