"""Model-class conveniences for drop-in compatibility with the reference API."""


class InferenceModel:
    """Mixin giving the torch-style no-op mode switches (models here are
    always inference-mode pure functions)."""

    def eval(self):
        return self

    def train(self, mode: bool = True):
        raise NotImplementedError("training is not supported (matches the reference, README.md:9)")
