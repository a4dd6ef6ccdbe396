# Operational entry points, mirroring the reference Makefile's run-/evaluate-
# targets (/root/reference/Makefile:80-113) without the docker-compose layer
# (the TPU runtime is the host environment).

PY ?= python
SEQ ?= 00
DATASET_ROOT ?= datasets

.PHONY: test bench accuracy accuracy-tpu native sanitize-test run-kitti run-euroc run-tum evaluate-kitti clean

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

# Offline accuracy matrix: renders ground-truth sequences (no datasets or
# egress needed; weights/superpoint_render.safetensors is committed), runs
# the real CLI runners end-to-end, writes ACCURACY.json.
accuracy:
	$(PY) scripts/accuracy_suite.py
	$(PY) scripts/accuracy_suite.py --merge --legs \
		--lg-checkpoints lightglue_synth.safetensors \
		lightglue_tpu2.safetensors lightglue_tpu3.safetensors

# On-hardware validation block: re-scores the stereo legs with the facade
# running on the real TPU (Pallas kernels, bf16, approx_max_k) and merges
# a tpu_legs block into the committed ACCURACY.json.
accuracy-tpu:
	$(PY) scripts/accuracy_suite.py --platform axon --merge \
		--legs stereo stereo_devkf

native:
	$(MAKE) -C csrc

sanitize-test:
	$(MAKE) -C csrc sanitize-test

run-kitti: native
	SUPERSLAM_ENABLE_LOOP=1 $(PY) examples/kitti.py configs/KITTI00-02.yaml \
		$(DATASET_ROOT)/kitti/sequences/$(SEQ) --no-viewer

run-euroc: native
	SUPERSLAM_ENABLE_LOOP=1 $(PY) examples/euroc.py configs/EuRoC.yaml \
		$(DATASET_ROOT)/euroc/$(SEQ) --no-viewer

run-tum: native
	SUPERSLAM_ENABLE_LOOP=1 $(PY) examples/tum_rgbd.py configs/TUM1.yaml \
		$(DATASET_ROOT)/tum/$(SEQ) --no-viewer

evaluate-kitti:
	$(PY) scripts/evaluate_kitti.py results/kitti/$(SEQ).txt \
		$(DATASET_ROOT)/kitti/poses/$(SEQ).txt

clean:
	$(MAKE) -C csrc clean
	rm -rf results
