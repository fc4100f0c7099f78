import jax.numpy as jnp

from .layers import (MultiHeadAttention, PositionwiseFeedForward,
                     EncoderLayer, DecoderLayer, sinusoid_position_encoding)
from .frontend import VisualFrontend, ResNetTrunk, BasicBlock, frontend_from_config
from .encoder import Encoder, encoder_from_config
from .decoder_sbl import SBLDecoder, preprocess_targets
from .decoder_uni import UniDecoder, preprocess_targets_uni
from .sbl import SBLTransformer, UniTransformer
from .classify import ClassifyTransformer


def build_model(cfg):
    """Construct the model for a WorkloadConfig."""
    dtype = jnp.dtype(cfg.compute_dtype)
    # sync_batchnorm=False: per-replica (DataParallel-parity) BN statistics,
    # one group per dp shard (parallel/mesh.py BatchNorm note)
    bn_groups = (cfg.mesh.data
                 if cfg.mesh.data > 1 and not cfg.mesh.sync_batchnorm else 1)
    frontend = frontend_from_config(cfg.frontend, dtype=dtype,
                                    remat=cfg.remat_frontend,
                                    bn_groups=bn_groups)
    encoder = encoder_from_config(cfg.dims, d_input=cfg.frontend.feature_dim,
                                  dtype=dtype,
                                  use_pallas=cfg.use_pallas_attention)
    if cfg.name == "classify":
        return ClassifyTransformer(frontend, encoder,
                                   num_word_classes=cfg.num_word_classes,
                                   num_languages=cfg.num_languages,
                                   language_slot=cfg.data.frames - 1)
    d = cfg.decoder
    if d.bidirectional:
        decoder = SBLDecoder(
            vocab_size=d.vocab_size, d_model=cfg.dims.d_model,
            n_layers=cfg.dims.n_dec_layers, n_head=cfg.dims.n_head,
            d_k=cfg.dims.d_k, d_v=cfg.dims.d_v, d_inner=cfg.dims.d_inner,
            dropout=cfg.dims.dropout, pe_maxlen=cfg.dims.pe_maxlen,
            maxlen=d.maxlen, fusion_mode=d.fusion_mode,
            teacher_forcing_rate=d.teacher_forcing_rate, dtype=dtype,
            use_pallas=cfg.use_pallas_attention,
            use_fused_layer=cfg.use_fused_decoder_layer,
            remat=cfg.remat_decoder,
            decode_segments=d.decode_segments,
            scan_unroll=d.scan_unroll,
            grad_accum_bf16=d.grad_accum_bf16)
        return SBLTransformer(frontend, encoder, decoder)
    decoder = UniDecoder(
        vocab_size=d.vocab_size, d_model=cfg.dims.d_model,
        n_layers=cfg.dims.n_dec_layers, n_head=cfg.dims.n_head,
        d_k=cfg.dims.d_k, d_v=cfg.dims.d_v, d_inner=cfg.dims.d_inner,
        dropout=cfg.dims.dropout, pe_maxlen=cfg.dims.pe_maxlen,
        maxlen=d.maxlen, tie_embedding=d.tie_embedding, dtype=dtype,
        use_pallas=cfg.use_pallas_attention)
    return UniTransformer(frontend, encoder, decoder)
