# Container packaging (Grand-Challenge compatible), TPU-native stack.
#
# Equivalent of the reference Dockerfile: non-root user, resources + code
# copied in, `python inference.py` entrypoint reading /input → /output.
# The base image must provide jax with the TPU runtime (e.g. a Cloud-TPU VM
# base); for CPU smoke runs any jax-enabled python:3.12 image works.

FROM python:3.12-slim

RUN groupadd -r user && useradd -m --no-log-init -r -g user user
RUN mkdir -p /opt/app /input /output \
    && chown user:user /opt/app /input /output

USER user
WORKDIR /opt/app
ENV PATH="/home/user/.local/bin:${PATH}"

RUN python -m pip install --user -U pip
# TPU hosts: pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN python -m pip install --user jax flax optax orbax-checkpoint numpy scipy pillow pandas matplotlib

COPY --chown=user:user att_aspp_unet_tpu /opt/app/att_aspp_unet_tpu
COPY --chown=user:user native /opt/app/native
COPY --chown=user:user inference.py /opt/app/
# minimal config-only resources tree (plans/dataset JSON; weights are mounted
# or baked by the deployment, see resources/README.md)
COPY --chown=user:user resources /opt/app/resources

# ---- AOT boot path (VERDICT r4 #7; NOTES.md probes r38/r40/r41) ----
# Serialized serving executables remove the remote compiler from the boot
# path entirely (probe r41: first call 2.3 s vs 43–174 s compile variance).
# Executables are DEVICE- and jax-version-specific, so this export step must
# run ON the deployment hardware — i.e. build the image on (or `docker run
# … warm` once from) the TPU host it will serve on, then bake/mount the
# directory.  On a CPU build host, leave it unset: a missing/mismatched
# directory logs `[aot] … MISS (jit fallback)` and serves via jit, never
# wrong.  Example export (deployment hardware, matching the case shape):
#   python -m att_aspp_unet_tpu.cli warm --export-aot /opt/app/aot --roi \
#       --weights <ckpt> --shapes 840x562x744 [--cascade --bulk 2]
# The entrypoint picks the directory up automatically when it exists:
ENV ATT_ASPP_AOT_DIR=/opt/app/aot

ENTRYPOINT [ "python", "-m", "inference" ]
