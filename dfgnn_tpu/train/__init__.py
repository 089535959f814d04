from dfgnn_tpu.train.loop import (
    TrainState,
    make_loss_fn,
    train_step,
    evaluate_rocauc,
    evaluate_accuracy,
    evaluate_mean_ap,
)
