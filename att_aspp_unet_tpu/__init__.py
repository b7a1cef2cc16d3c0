"""att_aspp_unet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for the
ACOUSLIC-AI fetal-abdomen pipeline.

Re-designed from scratch with the capabilities of the reference
``vivi-git188/ATT-ASPP-UNET`` (CUDA/PyTorch, single GPU): given a stacked 2-D
B-mode fetal-ultrasound sweep (``.mha`` volume), segment the fetal abdomen,
pick the single best frame, and measure the abdominal circumference (AC) in mm
via ellipse fitting.

Layer map (mirrors SURVEY.md §1, TPU-first):

- ``io``          host-side image IO: our own MetaImage (.mha) codec, PNG, JSON
- ``preprocess``  device-side frame enhancement (min-max, CLAHE, median-3, blur,
                  resize) batched over the whole sweep
- ``ops``         low-level XLA/Pallas kernels shared by the layers above
- ``nn``          neural building blocks (ConvBNReLU, ASPP, AttentionGate, UpBlock)
- ``models``      AttentionASPPUNet (v1 + ablation v2), PlainConvUNet baseline,
                  sliding-window Gaussian-weighted tiled predictor w/ mirror TTA
- ``parallel``    mesh construction + shardings (pjit / NamedSharding over ICI)
- ``train``       data pipeline, device-side augmentation, loss zoo, train loop
- ``postprocess`` threshold, connected components, morphology, frame selection
- ``measure``     ellipse fit (direct least squares) + Ramanujan-II AC in mm
- ``infer``       sweep inference engine, container entrypoint contract,
                  threshold calibration
- ``evals``       Dice/IoU/HD95 + Wilcoxon, AC analysis, error visualisation
- ``tools``       dataset builder (.mha→PNG), train/val split, leak checker
- ``utils``       config, profiling, torch-checkpoint import
"""

__version__ = "0.1.0"
