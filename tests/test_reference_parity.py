"""End-to-end numerical parity against the ACTUAL reference network.

Block-level parity (``test_blocks.py``) and golden numbers do not compose
into network parity for free: padding phases, the shortcut broadcast at
every contraction (reference ``regularization.py:114-119``), and the
eval-mode estimator chain (reference ``network.py:45-52``) all interact.
This test loads identical weights into the reference's own torch
``PdsNetwork`` (imported from ``/root/reference``) and into this framework
via ``training/torch_import.py``, then asserts:

* train-mode similarities match (<= 1e-3),
* eval-mode sub-pixel disparity maps match (<= 1e-2 px),
* the sub-pixel cross-entropy loss value and its gradients w.r.t. the
  parameters match on one training step.

Input is deliberately NOT a multiple of 64 (70x90 -> padded 128x128) so the
top/left padding phase (reference ``size_adapter.py:42-43``) is exercised.
"""

import sys

import numpy as np
import pytest
import torch

REFERENCE_ROOT = "/root/reference"
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

from practical_deep_stereo import loss as reference_loss  # noqa: E402
from practical_deep_stereo import network as reference_network  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from practicaldeepstereo_nips2018_tpu import models, ops  # noqa: E402
from practicaldeepstereo_nips2018_tpu.training import torch_import  # noqa: E402

MAXIMUM_DISPARITY = 63
HEIGHT, WIDTH = 70, 90


@pytest.fixture(scope="module")
def reference_net():
    torch.manual_seed(7)
    net = reference_network.PdsNetwork.default(
        maximum_disparity=MAXIMUM_DISPARITY)
    net.eval()
    return net


@pytest.fixture(scope="module")
def imported_params(reference_net):
    state = {key: value.detach().numpy()
             for key, value in reference_net.state_dict().items()}
    return torch_import.params_from_torch_state_dict(state)


@pytest.fixture(scope="module")
def stereo_pair():
    rng = np.random.RandomState(3)
    left = rng.uniform(0.0, 255.0, (1, HEIGHT, WIDTH, 3)).astype(np.float32)
    right = rng.uniform(0.0, 255.0, (1, HEIGHT, WIDTH, 3)).astype(np.float32)
    return left, right


def _to_torch_image(image_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(image_nhwc, (0, 3, 1, 2)))


@pytest.fixture(scope="module")
def config():
    return models.PDSConfig(maximum_disparity=MAXIMUM_DISPARITY)


def test_train_mode_similarities_match(reference_net, imported_params,
                                       stereo_pair, config):
    left, right = stereo_pair
    reference_net.train()
    with torch.no_grad():
        torch_similarities = reference_net(
            _to_torch_image(left), _to_torch_image(right)).numpy()
    reference_net.eval()

    similarities = models.apply(imported_params, jnp.asarray(left),
                                jnp.asarray(right), config)
    # Ours is disparity-last [B, H, W, D]; the reference is [B, D, H, W].
    similarities = np.transpose(np.asarray(similarities), (0, 3, 1, 2))

    assert similarities.shape == torch_similarities.shape
    np.testing.assert_allclose(similarities, torch_similarities,
                               atol=1e-3, rtol=1e-3)


def test_eval_mode_disparity_matches(reference_net, imported_params,
                                     stereo_pair, config):
    left, right = stereo_pair
    with torch.no_grad():
        torch_disparity = reference_net(
            _to_torch_image(left), _to_torch_image(right)).numpy()

    disparity = np.asarray(models.infer(imported_params, jnp.asarray(left),
                                        jnp.asarray(right), config))
    assert disparity.shape == torch_disparity.shape
    np.testing.assert_allclose(disparity, torch_disparity, atol=1e-2)


def test_loss_and_gradients_match(reference_net, imported_params,
                                  stereo_pair, config):
    left, right = stereo_pair
    rng = np.random.RandomState(11)
    ground_truth = rng.uniform(0.0, MAXIMUM_DISPARITY,
                               (1, HEIGHT, WIDTH)).astype(np.float32)
    ground_truth[0, ::5, ::7] = np.inf  # unknown pixels, reference loss.py:52

    reference_net.train()
    criterion = reference_loss.SubpixelCrossEntropy(diversity=1.0,
                                                    disparity_step=2)
    torch_similarities = reference_net(_to_torch_image(left),
                                       _to_torch_image(right))
    torch_loss = criterion(torch_similarities,
                           torch.from_numpy(ground_truth))
    torch_loss.backward()
    reference_net.eval()

    def loss_fn(params):
        similarities = models.apply(params, jnp.asarray(left),
                                    jnp.asarray(right), config)
        return ops.subpixel_cross_entropy(
            similarities, jnp.asarray(ground_truth), diversity=1.0,
            disparity_step=config.disparity_step)

    loss, gradients = jax.value_and_grad(loss_fn)(imported_params)
    np.testing.assert_allclose(float(loss), float(torch_loss.detach()),
                               atol=1e-4)

    def assert_gradients_close(ours, torch_grad):
        # f32 gradients through ~30 layers with different conv algorithms
        # accumulate O(1e-4) absolute error; compare against the gradient's
        # own scale (observed max deviation ~0.3% of max |grad|).
        scale = np.max(np.abs(torch_grad))
        np.testing.assert_allclose(ours, torch_grad, atol=0.02 * scale)

    # Gradients at both ends of the network: the first embedding conv (the
    # deepest leaf of the backward graph) and the final anisotropic
    # transposed conv. Layout maps mirror torch_import's weight maps (the
    # grad of a linear relabeling is the same relabeling).
    named = dict(reference_net.named_parameters())
    torch_grad = named[
        "_embedding._embedding_modules.1.0.weight"].grad.numpy()
    ours = np.asarray(gradients["embedding"]["conv1"]["conv"]["w"])
    ours = np.moveaxis(ours, (-1, -2), (0, 1))  # HWIO -> OIHW
    assert_gradients_close(ours, torch_grad)

    torch_grad = named[
        "_regularization._upsample_to_fullsize.weight"].grad.numpy()
    ours = np.asarray(
        gradients["regularization"]["upsample_to_fullsize"]["w"])
    ours = np.moveaxis(ours, (-2, -1), (0, 1))  # DHWIO -> IODHW
    ours = np.flip(ours, axis=(2, 3, 4))  # gather convention -> torch scatter
    assert_gradients_close(ours, torch_grad)
