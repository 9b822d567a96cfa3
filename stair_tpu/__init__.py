"""stair_tpu — a TPU-native neural-module-network framework for video QA.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the STAIR video
question-answering stack (reference: yellow-binary-tree/STAIR):

  * ``stair_tpu.programs`` — the program layer: AGQA annotation parsing,
    neural-program rewriting, the symbolic scene-graph executor that produces
    auditable per-step supervision, and question-span linking.
  * ``stair_tpu.ir`` — lowering of neural programs to fixed-shape padded
    instruction tables ("traces") that a compiled register machine executes.
  * ``stair_tpu.models`` — the neural module network itself: BiLSTM encoders,
    the 18 neural modules as pure JAX functions, and a ``lax.scan`` register
    machine executing a whole batch of programs in one compiled graph.
  * ``stair_tpu.data`` — host-side input pipeline (GloVe, h5/npy features,
    fixed-shape batch packing).
  * ``stair_tpu.train`` — per-module intermediate-supervision losses,
    contrastive training, the training loop, and checkpointing.
  * ``stair_tpu.parallel`` — device-mesh construction and sharding rules.
  * ``stair_tpu.llm`` — LLM integrations (video-prefix LM, filter-output
    prompting, Video-ChatGPT-style pipeline).

Unlike the reference (PyTorch eager, batch-size-1 Python interpreter), every
hot path here compiles: programs become static instruction tables, the module
interpreter is a ``lax.scan`` over those tables, and batches of heterogeneous
questions run as one XLA program under ``jit``/``pjit``.
"""

__version__ = "0.1.0"
