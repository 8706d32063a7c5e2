python train_toy.py --nblocks 6 --vnorms '2222' --dims '128-128' \
    --arch 'implicit' --brute-force True --save 'experiments/res_toy' --act 'sin' \
    --data 'checkerboard' --batch_size 5000 --coeff 0.99 --n-lipschitz-iters 20
