"""Engine: model facade, predictor, trainer, validator, results, exporter."""
