# rt3d build + test entry points

.PHONY: native test test-fast bench demo e2e train-weights verify-cpu clean

native:
	g++ -O2 -shared -fPIC -o native/librt3d_replayer.so native/replayer.cpp -lpthread

# tests must run on a REAL 8-device CPU mesh: scrub the TPU-tunnel site
# hooks (tests/conftest.py also self-corrects via re-exec, but invoking
# with the right env gives live output)
TEST_ENV = env -u PALLAS_AXON_POOL_IPS RT3D_TEST_REEXEC=1 JAX_PLATFORMS=cpu \
  PYTHONPATH=. XLA_FLAGS="--xla_force_host_platform_device_count=8"

# usage: make test [ARGS="tests/test_foo.py -k bar"]
test:
	$(TEST_ENV) python -m pytest $(or $(ARGS),tests/) -q

test-fast:
	$(TEST_ENV) python -m pytest tests/ -q -x -m "not slow"

bench:
	PYTHONPATH=.:$$PYTHONPATH python bench.py

demo:
	PYTHONPATH=.:$$PYTHONPATH python tools/demo_geometry.py

# everything verifiable without the TPU tunnel: the full suite plus the
# flagship demo (trained weights, fp then int8) driven end-to-end on the
# CPU backend. Slow (~40 min on the 1-core box) but it is the complete
# pre-chip validation — the chip session then only measures
# (tools/chip_checklist.sh).
verify-cpu: test
	$(TEST_ENV) python tools/demo_pipeline.py
	$(TEST_ENV) RT3D_DEMO_QUANT=1 python tools/demo_pipeline.py

# retrain the in-repo weight artifacts on the TPU (zero-egress analog of
# downloading the reference's published checkpoints; see README)
# round-4 regimen: mixed easy+hard domain (occlusion/texture/distractors),
# photometric + flip augmentation, on-mask anchor assignment, IoU
# regression loss; manifests record held-out HARD-family recall/IoU AND
# precision/FP rates (tools/eval_synth.py)
train-weights:
	PYTHONPATH=.:$$PYTHONPATH python tools/train_synth.py \
	  --steps 9000 --scenes 96 --frames-per-scene 2 \
	  --out weights/yolo11n_synth_seg.npz
	PYTHONPATH=.:$$PYTHONPATH python tools/train_synth.py --variant x \
	  --steps 9000 --scenes 96 --frames-per-scene 2 --lr 1e-4 --warmup 1000 \
	  --out weights/yolo11x_synth_seg.npz
	PYTHONPATH=.:$$PYTHONPATH python tools/train_synth.py --variant l \
	  --steps 9000 --scenes 96 --frames-per-scene 2 --lr 1e-4 --warmup 1000 \
	  --out weights/yolo11l_synth_seg.npz

# the L4 loop end to end on the device backend: record a synthetic HD720
# sequence -> replay it through the C++ mmap replayer into the full
# pipeline (CSV logs in runs_e2e/) -> compare against the reference's own
# RTX-4090 logs. Tiny-scale CPU twin: tests/test_e2e_replay.py.
e2e:
	PYTHONPATH=.:$$PYTHONPATH python -m rt3d.apps.record /tmp/rt3d_e2e.rts --frames 48
	PYTHONPATH=.:$$PYTHONPATH python -m rt3d.apps.two_cam \
	  --source /tmp/rt3d_e2e.rts --frames 144 --variant n --log-dir runs_e2e \
	  --scan 4 --pipeline-depth 3 --warmup 24
	PYTHONPATH=.:$$PYTHONPATH python -m rt3d.bench.compare --ours runs_e2e --drop-warmup 24
	@echo "NOTE: through the dev tunnel, host->device upload of the 13 MB"
	@echo "frame pair dominates (~160 ms/frame vs ~1.5 ms on a real host's"
	@echo "PCIe DMA). bench.py measures the compute path with frames staged."

clean:
	rm -f native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
