"""Seq2seq program parsers: question -> neural program.

The reference offers two parsers (SURVEY §2.8): a fairseq 2-layer LSTM
(README-driven CLI) and a fine-tuned Flan-T5-Large (``hf_program_parser.py``).
Both are replaced by JAX models trained with the same data contract
(question text in, space-joined program tokens out, beam-5 decode with the
``program_is_valid`` filter):

  * :mod:`stair_tpu.seq2seq.lstm` — attention LSTM encoder-decoder
    (the fairseq-class parser);
  * :mod:`stair_tpu.seq2seq.transformer` — pre-norm encoder-decoder
    transformer (the T5-class parser);
  * :mod:`stair_tpu.seq2seq.beam` — batched beam search over either;
  * :mod:`stair_tpu.seq2seq.train` — train/predict CLI emitting the TSV
    format the merge path (``preprocess --func upgrade``) consumes.
"""
