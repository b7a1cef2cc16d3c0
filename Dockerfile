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

ENTRYPOINT [ "python", "-m", "inference" ]
