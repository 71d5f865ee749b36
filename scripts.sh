#train script
python main.py --block_size 18 train --batch_size 48 --compile --save_every 1 --max_epochs 5

#train with native C++ batch assembly (bit-exact; 25x host assembly)
python main.py --block_size 18 train --batch_size 48 --preload_data --save_every 1 --max_epochs 5

#train ddp script (accepted for parity; sharding over the TPU mesh is always on)
python main.py --block_size 18 train --batch_size 48 --ddp --compile --save_every 1 --max_epochs 5

#eval script
python main.py --block_size 18 --n_embeds 9 eval --rtg 10 --max_timesteps 30

#mcts script
python main.py --block_size 18 --n_embeds 9 mcts --rtg 5 --max_timesteps 30

#flexible script
python main.py --block_size 18 --n_embeds 6 flex --max_timesteps 30

#headline benchmark (PnP-ADMM iters/sec/chip vs torch-CPU reference)
#NOTE: every bench below probes the TPU backend with a hard timeout and
#falls back to CPU (tpu_unreachable flagged in its JSON) when the axon
#tunnel is down — jax.devices() would otherwise hang forever.
python bench.py

#DT-guided inference benchmarks (greedy/flex/MCTS incl. the device-resident
#tree search and full-episode scaling)
python benchmarks/eval_bench.py

#training-step throughput (fused donated update, f32 + bf16)
python benchmarks/train_bench.py

#serving throughput/latency (batching service, policy + mcts modes,
#concurrent-client p50/p95/p99, pipelined-dispatch A/B)
python benchmarks/serving_bench.py

#end-to-end learning validation (record expert trajectories -> train ->
#held-out greedy eval reproduces the expert's PSNR gain)
python benchmarks/policy_learning_demo.py

#pallas-vs-XLA kernel benchmark
python benchmarks/pallas_bench.py

#U-Net shallow-conv layout probe (direct vs space-to-depth vs fused Pallas
#on the real block shapes; PROBE_BATCH=128 for the knee regime)
python benchmarks/conv_probe.py

#first command when the gated published checkpoints land: convert strictly,
#run all four modes in BOTH frameworks, emit the per-mode ddB parity table
python tools/validate_parity.py --dt model_experiment_2.pt --unet unet-nm.pt

#training input pipeline at dataset scale (410-trajectory json+h5 corpus
#through background_batches + prefetch_shard; --cpu = tunnel-free control)
python benchmarks/input_pipeline_bench.py
python benchmarks/input_pipeline_bench.py --cpu

#out-of-the-box data: scripted-expert training corpus + the nine default
#eval dirs (the reference's sets are email-/download-gated)
python tools/make_dataset.py --out data_synth --n_traj 128 --eval

#round-trip a native checkpoint back to the reference's torch layout
python tools/export_checkpoint.py --model dt --in checkpoints/model_5 \
  --out model_export.pt --block_size 18

#B=128 knee attribution: per-component slope timing of one ADMM iteration
#(unet / fft / kspace / layout / psnr vs the fused full step)
PROBE_BATCH=128 python benchmarks/knee_profile.py
PROBE_BATCH=128 PROBE_DTYPE=bfloat16 python benchmarks/knee_profile.py

#device-search knee attribution: whole-search per-iteration slope vs its
#components (policy / 6-slot expansion / rollout / tree bookkeeping)
SEARCH_BATCHES=16,64,128 python benchmarks/search_knee_profile.py

#run the TPU bench queue to completion across tunnel outages/flaps
#(probe-gated, timeout-bounded, restartable; tools/measure.py docstring
#has the operational rules learned on the flapping axon tunnel)
python tools/measure.py --out /tmp/measurements --pause-file /tmp/measurements/PAUSE \
  "serving:1500:python benchmarks/serving_bench.py" \
  "bench:2700:env BENCH_KNEE_DEADLINE_S=1800 python bench.py" \
  "eval:2700:python benchmarks/eval_bench.py" \
  "search_knee:3000:python benchmarks/search_knee_profile.py" \
  "conv_probe:2700:env PROBE_BATCH=128 python benchmarks/conv_probe.py"
